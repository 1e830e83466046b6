"""JVM-vs-Arrow fuzzy-candidate benchmark at dictionary scale.

Round-2 verdict #9: exercise the Arrow fuzzy path at its design scale and
prove the ARROW_FUZZY_TERM_THRESHOLD auto-flip (linking.py) wins there.
Generates synthetic ontology dictionaries of 1k/10k/50k/100k terms (pseudo-
word labels, deterministic), scores a fixed 2,000-mention distinct-mention
table through BOTH paths, and prints a wall-time table (min of N runs).

Run ALONE on the host (shared-box discipline, see BENCH.md):
    python tools/bench_fuzzy.py [--sizes 1000,10000,50000,100000] [--runs 2]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def pseudo_word(i: int, salt: str = "") -> str:
    """Deterministic pronounceable pseudo-word (no RNG, stable across runs)."""
    cons = "bcdfghklmnprstvz"
    vow = "aeiou"
    x = (i * 2654435761 + hash(salt) % 1000003) & 0xFFFFFFFF
    out = []
    for _ in range(3 + x % 4):
        out.append(cons[x % len(cons)])
        x //= len(cons)
        out.append(vow[x % len(vow)])
        x //= len(vow)
    return "".join(out)


def build_terms(spark, n: int):
    rows = [
        (f"T:{i}", pseudo_word(i) + (" " + pseudo_word(i, "b") if i % 5 == 0 else ""),
         True, i % 97 == 0, None)
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows,
        "term_id string, label string, in_target_ontology boolean, "
        "is_obsolete boolean, replaced_by string",
    )


def build_mentions(spark, n: int = 2000, vocab: int = 100_000):
    # mentions are dictionary words with 0-2 character edits -> realistic
    # fuzzy hit rates at every dictionary size
    rows = []
    for i in range(n):
        w = pseudo_word((i * 7919) % vocab)
        if i % 3 == 1 and len(w) > 4:
            w = w[:-1]  # deletion
        elif i % 3 == 2:
            w = w + "x"  # insertion
        rows.append((w,))
    return spark.createDataFrame(rows, "mention_norm string").coalesce(1)


def materialize(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1000,10000,50000,100000")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from eva_opentargets_spark.operators.fuzzy_udf import fuzzy_candidates_arrow
    from eva_opentargets_spark.operators.linking import fuzzy_candidates
    from eva_opentargets_spark.session import get_spark

    spark = get_spark(app_name="bench_fuzzy", master="local[8]", shuffle_partitions=8)
    mentions = build_mentions(spark).persist()
    mentions.count()

    print(f"{'terms':>8} | {'jvm sec':>8} | {'arrow sec':>9} | winner")
    print("-" * 46)
    results = []
    for n in (int(s) for s in args.sizes.split(",")):
        terms = build_terms(spark, n).persist()
        terms.count()
        jvm = min(materialize(fuzzy_candidates(mentions, terms)) for _ in range(args.runs))
        arrow = min(
            materialize(fuzzy_candidates_arrow(mentions, terms)) for _ in range(args.runs)
        )
        # sanity: the two paths agree on candidate count
        nj = fuzzy_candidates(mentions, terms).count()
        na = fuzzy_candidates_arrow(mentions, terms).count()
        assert nj == na, (n, nj, na)
        winner = "arrow" if arrow < jvm else "jvm"
        print(f"{n:>8} | {jvm:>8.2f} | {arrow:>9.2f} | {winner}  ({nj} candidates)")
        results.append((n, round(jvm, 2), round(arrow, 2), winner, nj))
        terms.unpersist()
    spark.stop()

    lines = [
        "",
        f"## JVM-vs-Arrow fuzzy scoring (2,000 distinct mentions, min of {args.runs}, local[8])",
        "",
        "| dictionary terms | JVM broadcast-band join (s) | Arrow banded UDF (s) | winner | candidates |",
        "|---|---|---|---|---|",
    ] + [f"| {n} | {j} | {a} | {w} | {c} |" for n, j, a, w, c in results] + [""]
    with open("BENCH.md", "a") as fh:
        fh.write("\n".join(lines))
    print("appended to BENCH.md")


if __name__ == "__main__":
    main()
