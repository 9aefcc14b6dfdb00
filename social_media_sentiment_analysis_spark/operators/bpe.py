"""Distributed BPE (byte-pair-encoding) merge training — the iterative
tokenizer-building algorithm, Spark-native.

Classic word-level BPE (Sennrich et al. 2016, public algorithm): represent
every distinct word as a character-symbol sequence weighted by word
frequency; repeatedly (1) count adjacent symbol pairs corpus-wide,
(2) take the most frequent pair (deterministic lexicographic tiebreak),
(3) merge that pair left-to-right in every sequence. The merge list IS the
tokenizer.

Spark shape: the working set is the *distinct-word* table (vocabulary-
sized, not corpus-sized — frequencies carry the corpus weight), so each
round is one explode+aggregate over |vocab| rows and a map-side array
rewrite. The merge rewrite is a sequential left fold (``F.aggregate``)
because BPE's left-to-right non-overlap rule is order-dependent — a
higher-order Column function, still JVM-side, no Python per row.
``localCheckpoint`` truncates lineage each round (same recipe as
operators/graph.py::pagerank); K rounds = K tiny jobs, not one K-deep plan.

The reference repo has no tokenizer; this is part of the training-data
pipeline surface (SURVEY §7.2 step 7 / vocab_pairs' big sibling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _merge_pair(syms_col, left: str, right: str):
    """Left-to-right non-overlapping merge of (left,right) in a symbol
    array, as a sequential fold. The merged symbol ``left+right`` can never
    equal ``left`` (``right`` is non-empty), so a freshly merged token is
    never itself the left half of another merge in the same pass — exactly
    the reference algorithm's scan semantics."""
    merged = left + right
    return F.aggregate(
        syms_col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1),
                     F.array(F.lit(merged))),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def train_bpe(word_freq: DataFrame, num_merges: int = 10,
              ) -> list[tuple[str, str, int]]:
    """Learn ``num_merges`` BPE merges from a (word, freq) DataFrame.

    Returns the ordered merge list [(left, right, pair_count), ...].
    Ties break lexicographically on (left, right) so the result is
    deterministic and engine-independent.
    """
    seqs = word_freq.select(
        "freq", F.split("word", "").alias("syms")).localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        pairs = (
            seqs.select(
                "freq",
                F.explode(F.arrays_zip(
                    F.slice("syms", 1, F.size("syms") - 1),
                    F.slice("syms", 2, F.size("syms") - 1),
                )).alias("p"))
            .groupBy(F.col("p.0").alias("left"), F.col("p.1").alias("right"))
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.desc("n"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not pairs or pairs[0]["n"] is None:
            break
        best = pairs[0]
        merges.append((best["left"], best["right"], int(best["n"])))
        seqs = seqs.select(
            "freq", _merge_pair(F.col("syms"), best["left"], best["right"])
            .alias("syms")).localCheckpoint()
    return merges


def train_bpe_batched(word_freq: DataFrame, num_merges: int = 10,
                      max_batch: int = 8, scan_width: int = 64,
                      passes_out: list | None = None,
                      ) -> list[tuple[str, str, int]]:
    """``train_bpe`` with MULTIPLE merges per Spark pass — the standard
    batching trick for driver-round-bound iterative training (r7 verdict
    #4), returning the EXACT sequential merge list by construction, not
    approximately.

    Each pass collects the top ``scan_width`` pairs once, then accepts a
    prefix of up to ``max_batch`` merges that sequential BPE provably
    selects in this order, using three facts: (1) merging (a,b) never
    INCREASES any pre-existing pair's count, and leaves untouched every
    pair disjoint from {a,b}; (2) the sorted (count desc, left, right)
    order IS sequential BPE's preference order, so an unaccepted old
    pair can never overtake an accepted one; (3) every NEW pair created
    by merging (a,b) — (x,ab) or (ab,y) — embeds an occurrence of a
    pre-existing pair that SHARES a symbol with (a,b) ((x,a) resp.
    (b,y)), so its count is bounded by the first conflicting pair's
    count. The scan therefore stops at the first pair sharing a symbol
    with an accepted one (bound B = its count), or at a self-pair
    (left==right — its merged token chains with itself, e.g. "aaaa" →
    (aa,aa), so the embedding argument gives no bound below its own
    count; it is accepted only as a pass's FIRST merge, where no earlier
    merge can spawn competitors), or at the scan-width horizon (B = last
    collected count — everything uncollected is ≤ it). Accepted merges
    after the first are kept only while count > B, so a new pair can
    never tie-break past them. Ties INSIDE the accepted prefix are safe:
    they are applied in sorted order, which is exactly the tiebreak
    order sequential uses.

    K merges cost ~K/avg_batch passes of 2 jobs (one pair count + one
    rewrite checkpoint) instead of K such passes — ≥5× fewer driver
    rounds on natural corpora, identical output (equality with
    ``train_bpe_reference`` pinned in tests, including tie/self-pair
    adversaries). ``passes_out``, when given, receives one appended
    batch-size per pass (observability for the job-count contract).
    """
    seqs = word_freq.select(
        "freq", F.split("word", "").alias("syms")).localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    while len(merges) < num_merges:
        top = (
            seqs.select(
                "freq",
                F.explode(F.arrays_zip(
                    F.slice("syms", 1, F.size("syms") - 1),
                    F.slice("syms", 2, F.size("syms") - 1),
                )).alias("p"))
            .groupBy(F.col("p.0").alias("left"), F.col("p.1").alias("right"))
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.desc("n"), F.asc("left"), F.asc("right"))
            .limit(scan_width)
            .collect()
        )
        top = [r for r in top if r["n"] is not None]
        if not top:
            break
        accepted: list[tuple[str, str, int]] = []
        used: set[str] = set()
        bound: int | None = None
        budget = min(max_batch, num_merges - len(merges))
        for r in top:
            left, right, n = r["left"], r["right"], int(r["n"])
            if len(accepted) >= budget or left in used or right in used \
                    or (left == right and accepted):
                bound = n
                break
            accepted.append((left, right, n))
            used.update((left, right))
            if left == right:
                bound = n
                break
        else:
            if len(top) == scan_width:
                bound = int(top[-1]["n"])
        if bound is not None:
            kept = [accepted[0]] + [p for p in accepted[1:]
                                    if p[2] > bound]
        else:
            kept = accepted
        merges.extend(kept)
        if passes_out is not None:
            passes_out.append(len(kept))
        col = F.col("syms")
        for left, right, _ in kept:
            col = _merge_pair(col, left, right)
        seqs = seqs.select("freq", col.alias("syms")).localCheckpoint()
    return merges


def train_bpe_reference(word_freq: dict[str, int],
                        num_merges: int = 10) -> list[tuple[str, str, int]]:
    """Single-process reference implementation (test oracle)."""
    seqs = [(list(w), f) for w, f in word_freq.items()]
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in seqs:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (a, b), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, n))
        new_seqs = []
        for syms, f in seqs:
            out: list[str] = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            new_seqs.append((out, f))
        seqs = new_seqs
    return merges


def encode_column(word_col, merges: list[tuple[str, str, int]]):
    """Apply an ordered merge list to one word — pure Column algebra.

    BPE encoding replays the merges in training order; each replay is the
    same left-to-right fold as training (``_merge_pair``). The expression
    nests |merges| folds, all JVM-side — no Python crossing, no UDF. Depth
    is fine for the tens-of-merges regime; a production tokenizer with 50k
    merges would move this exact loop into a pandas UDF (the expression
    tree, not the algorithm, is the limit).
    """
    syms = F.split(word_col, "")
    for left, right, _ in merges:
        syms = _merge_pair(syms, left, right)
    return syms


def encode_words(df: DataFrame, text_col: str,
                 merges: list[tuple[str, str, int]]) -> DataFrame:
    """Tokenize a corpus with a trained merge list, the scalable way:
    encode each DISTINCT word once (vocabulary-sized work — the encode
    fold runs |vocab| times, not |corpus| times), then broadcast-join the
    word → subwords map back onto the exploded corpus.

    Returns (word, subwords: array<string>, n_occurrences) — the corpus
    token stream grouped by source word; callers explode ``subwords``
    for the flat token sequence.
    """
    words = (
        df.select(F.explode(F.split(F.lower(text_col), "[^a-z]+"))
                  .alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word").agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    return words.select(
        "word", encode_column(F.col("word"), merges).alias("subwords"),
        "n_occurrences")


def encode_reference(word: str,
                     merges: list[tuple[str, str, int]]) -> list[str]:
    """Single-process reference encoder (test oracle)."""
    syms = list(word)
    for a, b, _ in merges:
        out: list[str] = []
        for x in syms:
            if out and out[-1] == a and x == b:
                out[-1] = a + b
            else:
                out.append(x)
        syms = out
    return syms
