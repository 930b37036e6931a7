"""Generate tests/fixtures/similarity_goldens.json by EXECUTING the
reference repo's similarity classes (scores + rendering_sequence triples)
on seeded deterministic inputs.

Run once (requires /root/reference to be present); the committed fixture
is then replayed by tests/test_similarity_goldens.py without needing the
reference — this is the reproducible parity evidence SURVEY §5 prescribes
for F5-F9 and the alignment renderers.

Reference classes executed (read-only): src/analysis/similarities/
{direct_match,consistency,text_edit,pattern,blat}_similarity.py and
src/analysis/models/match_pattern.py.
"""

from __future__ import annotations

import json
import os
import random
import sys

REF_SRC = "/root/reference/src"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures",
                   "similarity_goldens.json")

CONDITIONS = {
    "must": [{"offset": 0, "length": 4}, {"offset": 5, "length": 3}],
    "optional": [{"offset": -4, "length": 4}],
}


def main() -> int:
    if not os.path.isdir(REF_SRC):
        print("reference repo not present; goldens not regenerated", file=sys.stderr)
        return 1
    sys.path.insert(0, REF_SRC)
    from analysis.models.match_pattern import MatchPattern
    from analysis.similarities.blat_similarity import BlatSimilarity
    from analysis.similarities.consistency_similarity import ConsistencySimilarity
    from analysis.similarities.direct_match_similarity import DirectMatchSimilarity
    from analysis.similarities.pattern_similarity import PatternSimilarity
    from analysis.similarities.text_edit_similarity import TextEditSimilarity

    rnd = random.Random(20260813)

    def dna(n: int, alphabet: str = "acgt") -> str:
        return "".join(rnd.choice(alphabet) for _ in range(n))

    cases = []
    for i in range(300):
        gene = dna(12)
        # bias some windows toward the gene so runs/matches actually occur
        if i % 3 == 0:
            window = "".join(
                ch if rnd.random() < 0.7 else rnd.choice("acgt") for ch in gene
            )
        else:
            window = dna(12)
        direct = DirectMatchSimilarity()
        cons = ConsistencySimilarity(max_patience=2)
        te_abort = TextEditSimilarity(continuous_mismatch_limit=3)
        te_plain = TextEditSimilarity(continuous_mismatch_limit=None)
        # conditions are mutated (sorted in place) by the reference -> deep copy
        pat = PatternSimilarity(MatchPattern(gene, json.loads(json.dumps(CONDITIONS))))

        d_score, _ = direct.get_similarity(gene, window, 0)
        c_score, _ = cons.get_similarity(gene, window, 0)
        te_a, _ = te_abort.get_similarity(gene, window, 0)
        te_p, _ = te_plain.get_similarity(gene, window, 0)
        p_score = pat.get_similarity(gene, window, 0)
        cases.append({
            "gene": gene,
            "window": window,
            "direct_score": d_score,
            "direct_render": ["".join(x) for x in direct.rendering_sequence(gene, window, 0)],
            "consistency_score": c_score,
            "consistency_render": ["".join(x) for x in cons.rendering_sequence(gene, window, 0)],
            "textedit_abort3_score": te_a,
            "textedit_score": te_p,
            "textedit_render": ["".join(x) for x in te_plain.rendering_sequence(gene, window, 0)],
            "pattern_score": p_score,
            "pattern_render": ["".join(x) for x in pat.rendering_sequence(gene, window, 0)],
        })

    blat_cases = []
    blat = BlatSimilarity()
    n_matched = 0
    for i in range(400):
        gene = dna(8)
        if i % 2 == 0:
            # plant a corrupted copy of the gene so the seed-extend can fire
            mid = dna(rnd.randint(0, 6))
            noisy = "".join(
                ch if rnd.random() < 0.85 else rnd.choice("acgt") for ch in gene
            )
            database = dna(3) + noisy[:4] + mid + noisy[4:] + dna(6)
            offset = 3
        else:
            database = dna(30)
            offset = rnd.randint(0, 5)
        flag, end = blat.get_similarity(gene, database, offset)
        rend = None
        if flag:
            n_matched += 1
            rend = ["".join(x) for x in blat.rendering_sequence(gene, database, offset)]
        blat_cases.append({
            "gene": gene, "database": database, "offset": offset,
            "flag": bool(flag), "end": end, "render": rend,
        })

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump({"conditions": CONDITIONS, "cases": cases, "blat_cases": blat_cases},
                  f, indent=1)
    print(f"wrote {len(cases)} scorer cases + {len(blat_cases)} blat cases "
          f"({n_matched} matched) -> {OUT}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
