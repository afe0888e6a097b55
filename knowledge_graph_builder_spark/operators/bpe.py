"""Distributed BPE tokenizer training (Sennrich et al. 2016,
arXiv:1508.07909) — the classic byte-pair-encoding merge loop re-expressed
for corpus scale.

The scale shape: ONE corpus scan reduces the corpus to a word-frequency
dictionary (vocab-sized, not corpus-sized — the classic BPE training
input), and every merge iteration then costs O(vocab): an adjacent-pair
count aggregate (partial-aggregable, tie-broken deterministically) whose
result is a SINGLE collected row, followed by a JVM-side fold that applies
the merge to each word's symbol array. The corpus is never re-scanned and
nothing wider than one (pair, count) row ever reaches the driver, so the
loop runs the same on 100 TB as on a toy corpus. Lineage is truncated with
``localCheckpoint`` per iteration, the same pattern as the
connected-components loop in canonicalize.py.

No per-row Python anywhere: the merge application is a higher-order
``F.aggregate`` fold (leftmost, non-overlapping — exactly the reference
algorithm's replacement order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import normalize_text_col


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over normalized text — the corpus-sized scan happens
    exactly once; everything after is vocab-sized."""
    return (
        docs.select(F.explode(F.split(normalize_text_col(F.col(text_col)), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _apply_merge(syms, left: str, right: str):
    """Fold a symbol array, replacing adjacent (left, right) with
    left+right — leftmost-first, non-overlapping ("aaa" + merge (a,a)
    -> [aa, a]). acc carries the emitted prefix plus one pending symbol."""
    empty = F.array().cast("array<string>")
    pend_null = F.lit(None).cast("string")
    return F.aggregate(
        syms,
        F.struct(empty.alias("out"), pend_null.alias("pend")),
        lambda acc, x: F.when(
            acc["pend"].isNull(), F.struct(acc["out"].alias("out"), x.alias("pend"))
        )
        .when(
            (acc["pend"] == F.lit(left)) & (x == F.lit(right)),
            F.struct(
                F.concat(acc["out"], F.array(F.lit(left + right))).alias("out"),
                pend_null.alias("pend"),
            ),
        )
        .otherwise(
            F.struct(F.concat(acc["out"], F.array(acc["pend"])).alias("out"), x.alias("pend"))
        ),
        lambda acc: F.when(acc["pend"].isNull(), acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["pend"]))
        ),
    )


def bpe_train(docs: DataFrame, n_merges: int = 8, text_col: str = "text") -> DataFrame:
    """Learn the top ``n_merges`` BPE merges over a document corpus.

    Returns (rank, left, right, merged, pair_freq) — the merge table a
    tokenizer consumes, in learned order. Pair selection is deterministic:
    highest summed word frequency, ties broken lexicographically on
    (left, right). Stops early if no adjacent pair remains.
    """
    spark = docs.sparkSession
    words = (
        word_frequencies(docs, text_col)
        .select("freq", F.split("word", "").alias("syms"))
        .localCheckpoint()
    )
    merges: list[tuple] = []
    for rank in range(n_merges):
        pairs = words.filter(F.size("syms") >= 2).select(
            "freq",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("syms") - 2),
                    lambda i: F.struct(
                        F.try_element_at("syms", i + 1).alias("l"),
                        F.try_element_at("syms", i + 2).alias("r"),
                    ),
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy("p")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.col("n").desc(), F.col("p.l"), F.col("p.r"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        left, right, n = best[0]["p"]["l"], best[0]["p"]["r"], best[0]["n"]
        merges.append((rank, left, right, left + right, int(n)))
        words = words.select(
            "freq", _apply_merge(F.col("syms"), left, right).alias("syms")
        ).localCheckpoint()
    return spark.createDataFrame(
        merges, "rank int, left string, right string, merged string, pair_freq bigint"
    )


def bpe_train_local(texts: list[str], n_merges: int = 8) -> list[tuple]:
    """Pure-Python reference twin of ``bpe_train`` (the textbook Sennrich
    algorithm over the same normalization). Driver-side only — used by the
    oracle and tests as an independent implementation to pin the
    distributed loop against; NEVER called on corpus-scale data."""
    import re
    from collections import Counter

    wf: Counter = Counter()
    for t in texts:
        normed = re.sub(r"\s+", " ", re.sub(r"[^a-z0-9\s]", " ", (t or "").lower())).strip()
        for w in normed.split(" "):
            if w:
                wf[w] += 1
    words = {w: list(w) for w in wf}
    merges: list[tuple] = []
    for rank in range(n_merges):
        pc: Counter = Counter()
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += wf[w]
        if not pc:
            break
        (left, right), n = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
        merges.append((rank, left, right, left + right, n))
        for w, syms in words.items():
            out: list[str] = []
            pend = None
            for x in syms:
                if pend is None:
                    pend = x
                elif pend == left and x == right:
                    out.append(left + right)
                    pend = None
                else:
                    out.append(pend)
                    pend = x
            if pend is not None:
                out.append(pend)
            words[w] = out
    return merges


def _merge_kernel(merge_list: list[tuple[str, str]]):
    """mapInArrow kernel applying a full merge list to each word — one
    single-pass leftmost/non-overlapping fold per merge in rank order,
    byte-identical to ``bpe_apply_local``. O(vocab) Python is legitimate
    here for the same reason as the extraction kernel: the input frame is
    the word-frequency DICTIONARY (vocab-sized), never the corpus. The
    symbol-presence gate skips the (vast majority of) merges whose parts
    cannot occur in a word, so a 50k-merge tokenizer costs ~word_len
    applied merges per word, not 50k passes."""
    import pyarrow as pa

    def kernel(batches):
        for batch in batches:
            words = batch.column("word").to_pylist()
            freqs = batch.column("freq").to_pylist()
            toks: list[list[str]] = []
            for w in words:
                syms = list(w)
                present = set(syms)
                for left, right in merge_list:
                    if left not in present or right not in present:
                        continue
                    out: list[str] = []
                    pend = None
                    changed = False
                    for x in syms:
                        if pend is None:
                            pend = x
                        elif pend == left and x == right:
                            out.append(left + right)
                            pend = None
                            changed = True
                        else:
                            out.append(pend)
                            pend = x
                    if pend is not None:
                        out.append(pend)
                    if changed:
                        syms = out
                        present = set(syms)
                toks.append(syms)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(words, pa.string()),
                    pa.array(freqs, pa.int64()),
                    pa.array(toks, pa.list_(pa.string())),
                ],
                names=["word", "freq", "tokens"],
            )

    return kernel


def bpe_apply(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    method: str = "auto",
) -> DataFrame:
    """Tokenize a corpus with a learned merge list: (word, freq, tokens).

    Two physical strategies over the same vocab-sized word-frequency
    frame, identical output (pinned against ``bpe_apply_local`` by test):

    * ``fold`` — each merge compiles to a JVM-side ``F.aggregate`` fold.
      Zero Python, whole-stage codegen, but the Catalyst expression tree
      grows linearly with the merge count: fine for dozens of merges,
      analysis/codegen-prohibitive at real tokenizer scale (30k-50k).
    * ``kernel`` — ONE ``mapInArrow`` pass applies the whole merge list
      per word (rank order, leftmost non-overlapping — the Sennrich
      replacement order). Plan size is constant in the merge count; the
      Python cost is O(vocab x applied-merges), bounded because the frame
      is the dictionary, not the corpus.

    ``auto`` picks ``fold`` for <= 32 merges (SQL-expressible, oracle
    path) and ``kernel`` beyond — a 30k-merge tokenizer must never build
    a 30k-deep expression tree.
    """
    wf = word_frequencies(docs, text_col)
    merge_list = [(str(l), str(r)) for l, r in merges]
    if method not in ("auto", "fold", "kernel"):
        raise ValueError(f"unknown method {method!r}")
    if method == "fold" or (method == "auto" and len(merge_list) <= 32):
        tokens = F.split(F.col("word"), "")
        for left, right in merge_list:
            tokens = _apply_merge(tokens, left, right)
        return wf.select("word", "freq", tokens.alias("tokens"))
    return wf.select("word", "freq").mapInArrow(
        _merge_kernel(merge_list), schema="word string, freq bigint, tokens array<string>"
    )


def bpe_apply_local(texts: list[str], merges: list[tuple[str, str]]) -> dict[str, tuple[int, list[str]]]:
    """Pure-Python twin of ``bpe_apply`` (same normalization and
    replacement order); word -> (freq, tokens). Oracle/test use only."""
    import re
    from collections import Counter

    wf: Counter = Counter()
    for t in texts:
        normed = re.sub(r"\s+", " ", re.sub(r"[^a-z0-9\s]", " ", (t or "").lower())).strip()
        for w in normed.split(" "):
            if w:
                wf[w] += 1
    out: dict[str, tuple[int, list[str]]] = {}
    for w, freq in wf.items():
        syms = list(w)
        for left, right in merges:
            folded: list[str] = []
            pend = None
            for x in syms:
                if pend is None:
                    pend = x
                elif pend == left and x == right:
                    folded.append(left + right)
                    pend = None
                else:
                    folded.append(pend)
                    pend = x
            if pend is not None:
                folded.append(pend)
            syms = folded
        out[w] = (freq, syms)
    return out
