"""Byte-pair-encoding tokenizer: a REAL merge-table trainer and a
distributed, expression-only apply path — this closes the documented
swap point in datapipe.tokenize (the md5 vocab-id hash stand-in).

Algorithm is the public Sennrich et al. 2016 subword-nmt procedure:
count adjacent symbol pairs over a word-frequency table, repeatedly
merge the most frequent pair. The Spark-side split of labor matches
the 100 TB shape: pair-count INPUT (pre-token frequencies) is a
Spark aggregation bounded to ``max_word_types`` rows (word types grow
sub-linearly in corpus size — Heaps' law — and are capped
explicitly), the merge LOOP runs on the driver over that bounded
table, and APPLY is pure Column expressions over DISTINCT pre-tokens
(each word type is segmented once, then joined back / weighted —
never once per occurrence).

Cross-engine apply semantics (the part that makes a DuckDB oracle
value-exact): a word is represented as its codepoints joined by the
``\\x1f`` unit separator (leading spaces first mapped to the GPT-2
style ``Ġ`` marker), and each merge (a,b) is applied as EIGHT
successive ``replace(SEP+a+SEP+b+SEP -> SEP+ab+SEP)`` passes, in
merge order. Leftmost non-overlapping REPLACE has identical semantics
in Python ``str.replace``, Spark ``F.replace`` and DuckDB
``replace``, and Spark ``F.split(s, "")`` and DuckDB
``string_split(s, '')`` both split by codepoint — so all three
implementations agree byte-for-byte by construction. Eight passes
reach the true BPE fixpoint for words up to ~64 symbols (each pass
merges at least half the remaining occurrences); beyond that all
implementations still agree with each other (they run the same
八 passes), they just may under-merge a pathological run — disclosed,
and unreachable from trained merges (training caps word length).

Reference parity: the reference engine has no tokenizer (it is a
schema validator; see SURVEY.md §2.7) — this operator belongs to the
LLM-data-pipeline surface. Its output feeds the input_hint sequence
shape exactly like tokenize.tokenize_documents (doc_id, tokens,
n_tok, source).

Caveats (disclosed): the ``\\x1f`` separator is stripped from input
text before splitting (both engines, deterministically), and a
literal ``Ġ`` in input is conflated with the leading-space marker —
both are identical across engines, so parity is unaffected.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sjot_spark.datapipe.tokenize import pretokenize, token_id_expr

SEP = "\x1f"        # symbol separator in the spaced representation
SPACE_MARK = "Ġ"  # 'Ġ' — GPT-2-style leading-space marker
MERGE_KV = "\x1e"   # pattern/replacement separator in encoded merges
PASSES = 8          # replace passes per merge (fixpoint for <=64 syms)
MAX_WORD_LEN = 48   # trainer word-length cap (keeps PASSES exact)


# ---------------------------------------------------------------- #
# pure-python core (trainer + parity twin of the engine apply path) #
# ---------------------------------------------------------------- #

def _spaced(word: str) -> str:
    """' hello' -> '\\x1fĠ\\x1fh\\x1fe\\x1fl\\x1fl\\x1fo\\x1f'."""
    return SEP + SEP.join(word.replace(" ", SPACE_MARK)) + SEP


def _merge_passes(s: str, pat: str, rep: str) -> str:
    """PASSES leftmost-non-overlapping replace rounds — the exact
    semantics the Spark and DuckDB apply expressions implement."""
    for _ in range(PASSES):
        if pat not in s:
            break
        s = s.replace(pat, rep)
    return s


def segment_py(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Pure-python BPE segmentation of one pre-token; the parity twin
    of bpe_segment_expr (identical by construction, pytest-pinned)."""
    s = _spaced(word)
    for a, b in merges:
        s = _merge_passes(s, SEP + a + SEP + b + SEP, SEP + a + b + SEP)
    return [t for t in s.split(SEP) if t]


def train_merges_from_counts(
    word_counts: dict[str, int],
    n_merges: int,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Sennrich merge loop over a word-frequency table. Deterministic:
    ties on pair count break to the lexicographically smallest pair.
    Stops early when no pair reaches ``min_pair_count``."""
    words = {_spaced(w): int(c) for w, c in word_counts.items()}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for s, c in words.items():
            syms = s.split(SEP)[1:-1]
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best = min(pairs, key=lambda p: (-pairs[p], p))
        if pairs[best] < min_pair_count:
            break
        a, b = best
        pat, rep = SEP + a + SEP + b + SEP, SEP + a + b + SEP
        words = {
            (_merge_passes(s, pat, rep) if pat in s else s): c
            for s, c in words.items()
        }
        merges.append(best)
    return merges


def vocab_from_merges(
    word_counts: dict[str, int], merges: list[tuple[str, str]]
) -> list[str]:
    """Deterministic vocab: sorted base symbols (codepoints of the
    training words, space mapped to Ġ) then merged symbols in merge
    order. Token id = index in this list."""
    base = sorted({ch for w in word_counts for ch in w.replace(" ", SPACE_MARK)})
    merged = [a + b for a, b in merges]
    seen, out = set(), []
    for s in base + merged:
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out


# A small fixed word-frequency table (plain-English pre-tokens with
# GPT-2-style leading spaces) used for the CONTRACT-pinned merge
# table: the driver's oracle SQL is a static string, so the contract
# query's merges must not depend on the scale-factor data. The
# Spark-trained path (train_bpe) is exercised separately in pytest.
SEED_WORD_COUNTS: dict[str, int] = {
    "the": 40, " the": 180, " of": 95, " and": 88, " to": 82, " in": 64,
    " a": 60, " is": 44, " that": 38, " for": 33, " it": 30, " as": 27,
    " was": 26, " with": 25, " be": 24, " by": 23, " on": 22, " not": 21,
    " he": 20, " this": 19, " are": 18, " or": 17, " his": 16,
    " from": 15, " at": 14, " which": 13, " but": 12, " have": 11,
    " an": 11, " had": 10, " they": 10, " you": 9, " were": 9,
    " their": 8, " one": 8, " all": 7, " we": 7, " can": 6, " her": 6,
    " has": 6, " there": 5, " been": 5, " if": 5, " more": 5, " when": 4,
    " will": 4, " would": 4, " who": 4, " so": 3, " no": 3,
    "ing": 14, " said": 3, " what": 3, " up": 3, " its": 3, " about": 3,
    " into": 2, " than": 2, " them": 2, " only": 2, " other": 2,
    " time": 2, " new": 2, " some": 2, " could": 2, " these": 2,
    " two": 2, " may": 2, " then": 2, " do": 2, " first": 2, " any": 2,
    " my": 2, " now": 2, " such": 2, " like": 2, " our": 2, " over": 2,
}
DEFAULT_N_MERGES = 48


@lru_cache(maxsize=None)
def default_merges() -> tuple[tuple[str, str], ...]:
    """The contract-pinned merge table (trained once, pure python)."""
    return tuple(train_merges_from_counts(SEED_WORD_COUNTS, DEFAULT_N_MERGES))


# ---------------------------------------------------------------- #
# Spark-side trainer                                                #
# ---------------------------------------------------------------- #

def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 100,
    max_word_types: int = 20_000,
    min_count: int = 2,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Train a BPE merge table from a corpus DataFrame. The
    pair-count SOURCE (pre-token frequency table) is a Spark
    aggregation — one explode + one groupBy, map-side combined — and
    only the top ``max_word_types`` word types (by count desc, word
    asc: deterministic) reach the driver, where the small merge loop
    runs. At 100 TB the collected table stays ~1e4 rows regardless of
    corpus size."""
    clean = F.replace(F.col(text_col), F.lit(SEP), F.lit(""))
    rows = (
        df.select(F.explode(pretokenize(clean)).alias("w"))
        .where(F.length("w") <= MAX_WORD_LEN)
        .groupBy("w").agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= min_count)
        .orderBy(F.col("c").desc(), F.col("w"))
        .limit(max_word_types)
        .collect()
    )
    return train_merges_from_counts(
        {r.w: r.c for r in rows}, n_merges, min_pair_count)


# ---------------------------------------------------------------- #
# Spark-side apply (pure Column expressions, JVM-side)              #
# ---------------------------------------------------------------- #

def bpe_segment_expr(
    tok: Column, merges: list[tuple[str, str]] | tuple
) -> Column:
    """array<string> of BPE tokens for ONE pre-token column. The fold
    over the merge table is a single F.aggregate whose lambda applies
    PASSES nested F.replace calls — plan size is constant in merge
    count (the merges live in one literal array), and everything is
    JVM-side string work, no Python in the hot path."""
    t = F.replace(tok, F.lit(" "), F.lit(SPACE_MARK))
    spaced = F.concat(F.lit(SEP), F.array_join(F.split(t, ""), SEP),
                      F.lit(SEP))
    marr = F.array(*[
        F.struct(F.lit(SEP + a + SEP + b + SEP).alias("p"),
                 F.lit(SEP + a + b + SEP).alias("r"))
        for a, b in merges
    ])

    def step(acc: Column, m: Column) -> Column:
        for _ in range(PASSES):
            acc = F.replace(acc, m["p"], m["r"])
        return acc

    folded = F.aggregate(marr, spaced, step)
    return F.filter(F.split(folded, SEP), lambda x: x != F.lit(""))


def tokenize_documents_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]] | tuple,
    vocab: list[str] | None = None,
    max_word_types: int = 20_000,
) -> DataFrame:
    """BPE twin of tokenize.tokenize_documents: documents ->
    (doc_id, tokens array<int>, n_tok, source). Each DISTINCT
    pre-token is segmented once and broadcast-joined back (word types
    << word occurrences), token order inside a document is preserved
    via (pre-token position, sub-token position) sort keys. Ids come
    from the trained ``vocab`` (broadcast join); out-of-vocab tokens
    fall back to the engine-independent md5 hash id offset past the
    vocab, so ids never collide across the two spaces.

    With ``vocab=None`` the fallback vocab is derived from this
    corpus's word types, collected to the driver under the same
    deterministic ``max_word_types`` cap as train_bpe (count desc,
    word asc) — the driver materialization stays bounded at any
    corpus size; rarer words' symbols are covered by the hash-id OOV
    space exactly like unseen test-time words."""
    spark = df.sparkSession
    clean = F.replace(F.col("text"), F.lit(SEP), F.lit(""))
    pre = df.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col("source"),
        F.posexplode_outer(pretokenize(clean)).alias("i", "w"),
    )
    word_types = pre.where(F.col("w").isNotNull()).select("w").distinct()
    seg = word_types.select(
        "w", bpe_segment_expr(F.col("w"), merges).alias("toks"))
    joined = pre.join(F.broadcast(seg), "w", "left")
    flat = joined.select(
        "doc_id", "source", "i",
        F.posexplode_outer("toks").alias("j", "tok"),
    )
    if vocab is None:
        top_types = (
            pre.where(F.col("w").isNotNull())
            .groupBy("w").agg(F.count(F.lit(1)).alias("c"))
            .orderBy(F.col("c").desc(), F.col("w"))
            .limit(max_word_types)
            .collect()
        )
        vocab = vocab_from_merges(
            {r.w: 1 for r in top_types} or {"a": 1}, list(merges))
    vdf = spark.createDataFrame(
        [(s, i) for i, s in enumerate(vocab)], "tok string, vid int")
    with_ids = flat.join(F.broadcast(vdf), "tok", "left").select(
        "doc_id", "source", "i", "j",
        F.coalesce(
            F.col("vid"),
            (token_id_expr(F.col("tok")) + F.lit(len(vocab))).cast("int"),
        ).alias("tid"),
    )
    ordered = (
        with_ids.groupBy("doc_id", "source")
        .agg(F.array_sort(F.collect_list(F.struct("i", "j", "tid")))
             .alias("triples"))
        .select(
            "doc_id",
            F.filter(
                F.transform(F.col("triples"), lambda s: s["tid"]),
                lambda x: x.isNotNull(),
            ).alias("tokens"),
            "source",
        )
    )
    return ordered.select(
        "doc_id",
        F.col("tokens").cast("array<int>").alias("tokens"),
        F.size("tokens").cast("int").alias("n_tok"),
        "source",
    )


# ---------------------------------------------------------------- #
# DuckDB oracle SQL generation                                      #
# ---------------------------------------------------------------- #

def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def merges_sql_literals(merges) -> str:
    """DuckDB list literal of 'pattern\\x1ereplacement' strings."""
    items = [
        _sql_quote(SEP + a + SEP + b + SEP + MERGE_KV + SEP + a + b + SEP)
        for a, b in merges
    ]
    return "[" + ", ".join(items) + "]"


def segment_sql(word_expr: str, merges) -> str:
    """DuckDB expression: BPE token list for one pre-token — the
    byte-identical twin of bpe_segment_expr (same spaced form, same
    merge order, same PASSES replace rounds)."""
    rep = "acc"
    for _ in range(PASSES):
        rep = (f"replace({rep}, split_part(m, chr(30), 1), "
               f"split_part(m, chr(30), 2))")
    spaced = (f"chr(31) || array_to_string(string_split("
              f"replace({word_expr}, ' ', 'Ġ'), ''), chr(31)) "
              f"|| chr(31)")
    folded = (f"list_reduce(list_concat([{spaced}], "
              f"{merges_sql_literals(merges)}), (acc, m) -> {rep})")
    return (f"list_filter(string_split({folded}, chr(31)), "
            f"x -> x <> '')")
