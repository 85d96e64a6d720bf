"""Error types.

The reference signals data violations by throwing strings
(sjot_error, /root/reference/index.js:1247-1269) and schema problems
via sjot_schema_error (/root/reference/index.js:2045-2049). Our
engine never throws on data (violations become rows); schema problems
raise SpecError at compile/check time, before any Spark job runs.
"""


class SpecError(ValueError):
    """Invalid CheckSpec — analog of SJOT schema errors.

    Mirrors sjot_schema_error: message carries a /path into the spec.
    """

    def __init__(self, message: str, typepath: str = ""):
        self.typepath = typepath
        super().__init__(
            f"SJOT spec error: {message}" + (f" at {typepath}" if typepath else "")
        )
