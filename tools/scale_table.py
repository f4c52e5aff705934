#!/usr/bin/env python3
"""Render the SCALE.md sf0.1->sf1 ratio table from two bench_full JSONs.

Usage: tools/scale_table.py <sf01.json> <sf1.json> [<sf10.json>]

Each input is one graft.Bench full-JSON line (same estimator, same box,
same query allowlist). Prints a markdown table of per-query seconds and
the sf1/sf0.1 ratio at 10x rows, annotated with the operator's documented
complexity so a reviewer can see at a glance which ratios are explained
and which are surprises.
"""
import json
import sys

# documented complexity per operator (SCALE.md); ratio bands are what a
# 10x-rows decade should produce on this box: linear work lands well
# under 10 when sf0.1's single-file layout under-parallelizes the small
# point (more input splits at sf1 = more cores used), and a little over
# 10 when both points saturate and fixed overheads amortize away.
EXPECTED = {
    "agg_stats": ("linear scan+agg", 13),
    "bpe_train": ("linear per round, fixed rounds", 13),
    "dedup_exact": ("linear hash-groupBy", 13),
    "dedup_embedding": ("pairs O(N): constant-occupancy cells", 13),
    "dedup_minhash_lsh": ("linear signatures + band join", 13),
    "dedup_ngram_jaccard": ("linear shingles + band join", 13),
    "dedup_substring": ("O(total chars) explode + window", 13),
    "dedup_substring_rewrite": ("O(total chars), narrower exchange", 13),
    "events_sessionize": ("linear window", 13),
    "hard_negatives": ("O(N): constant-occupancy mining cells", 13),
    "join_chain": ("linear probe, broadcast dims", 13),
    "kcore": ("linear per peel round", 16),
    "pagerank": ("linear per iteration, fixed iters", 13),
    "proj_derive": ("linear projection", 13),
    "schedule_deviation": ("linear probe, broadcast dims", 13),
    "shuffle_export": ("linear shard window", 13),
    "simsearch_ivf": ("linear index build, fixed query set", 13),
    "source_overlap": ("linear scan + |sources|*k tail", 13),
    "dedup_embedding_fixed": ("pairs O(N) after constant-occupancy fix", 13),
    "text_quality": ("linear stateless fold", 13),
    "tfidf_topk": ("linear explode + term agg", 13),
    "triangle_count": ("edge-iterator, bounded by degree skew", 16),
    "window_dedup": ("linear window", 13),
    "window_dedup_salted": ("linear two-stage window", 13),
}


def load(p):
    with open(p) as f:
        return json.load(f)


def main():
    a, b = load(sys.argv[1]), load(sys.argv[2])
    c = load(sys.argv[3]) if len(sys.argv) > 3 else None
    qa, qb = a["queries"], b["queries"]
    qc = c["queries"] if c else {}
    hdr = "| query | sf0.1 s | sf1 s | ratio @10x | sf10 s | ratio @100x | complexity |"
    sep = "|---|---|---|---|---|---|---|"
    if not c:
        hdr = "| query | sf0.1 s | sf1 s | ratio @10x | complexity |"
        sep = "|---|---|---|---|---|"
    print(hdr)
    print(sep)
    flagged = []
    for q in sorted(set(qa) & set(qb)):
        ta, tb = qa[q], qb[q]
        if ta <= 0 or tb <= 0:
            continue
        r = tb / ta
        note, bound = EXPECTED.get(q, ("?", 13))
        mark = " **(!)**" if r > bound else ""
        if r > bound:
            flagged.append((q, r, bound))
        if c and q in qc and qc[q] > 0:
            r2 = qc[q] / ta
            mark2 = " **(!)**" if r2 > bound * bound / 1.3 else ""
            print(f"| {q} | {ta:.2f} | {tb:.2f} | {r:.1f}x{mark} "
                  f"| {qc[q]:.2f} | {r2:.0f}x{mark2} | {note} |")
        else:
            print(f"| {q} | {ta:.2f} | {tb:.2f} | {r:.1f}x{mark} | {note} |")
    if flagged:
        print()
        for q, r, bound in flagged:
            print(f"<!-- FLAG: {q} ratio {r:.1f} exceeds documented band {bound} -->")


if __name__ == "__main__":
    main()
