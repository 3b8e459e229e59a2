"""Generate the statistically-sized bundled eval task (round-4 VERDICT #3).

The 6-10-sample files in tests/tasks/ exercise the eval STACK; this one
(300 samples, arc-style field spellings) gives the quality-floor gate real
statistical power: at n=300 a binomial proportion has ~1.3-2.9% std, so a
few-percent fp-vs-quant agreement drop is detectable, matching the
reference's recorded-floor discipline (reference
tests/models/model_test.py:1539, tests/models/test_llama3_2.py:28-55).

Deterministic templated content (no RNG surprises, no hub access); the gold
answers are actually correct so the file doubles as a real mini-task.
Regenerate with:  python scripts/gen_synth_tasks.py
"""

import json
from pathlib import Path

import numpy as np


def gen_samples(n=300, seed=1234):
    rng = np.random.default_rng(seed)
    out = []
    while len(out) < n:
        kind = len(out) % 6
        if kind == 0:  # addition
            a, b = int(rng.integers(3, 60)), int(rng.integers(3, 60))
            q = f"What is {a} plus {b}?"
            gold = a + b
            opts = {gold, gold + 1, gold - 1, gold + int(rng.integers(2, 9))}
        elif kind == 1:  # subtraction
            a, b = int(rng.integers(30, 99)), int(rng.integers(2, 29))
            q = f"What is {a} minus {b}?"
            gold = a - b
            opts = {gold, gold + 2, gold - 2, gold + int(rng.integers(3, 11))}
        elif kind == 2:  # max
            vals = sorted(set(int(v) for v in rng.integers(5, 95, size=6)))
            if len(vals) < 4:
                continue
            vals = vals[:4]
            q = f"Which number is largest: {', '.join(map(str, vals))}?"
            gold = max(vals)
            opts = set(vals)
        elif kind == 3:  # successor
            a = int(rng.integers(10, 180))
            q = f"What number comes right after {a}?"
            gold = a + 1
            opts = {gold, a, a + 2, a - 1}
        elif kind == 4:  # doubling
            a = int(rng.integers(4, 48))
            q = f"What is double the number {a}?"
            gold = 2 * a
            opts = {gold, 2 * a + 1, 2 * a - 2, a + 2}
        else:  # counting words
            k = int(rng.integers(3, 7))
            words = ["sun", "map", "tree", "rock", "bird", "leaf", "wave"][:k]
            q = f"How many words are in this list: {' '.join(words)}?"
            gold = k
            opts = {k, k + 1, k - 1, k + 2}
        opts = sorted(opts)
        if len(opts) < 4 or gold not in opts:
            continue
        opts = (opts * 2)[:4]  # defensive; sets above give >=4
        perm = rng.permutation(4)
        text = [str(opts[p]) for p in perm]
        answer_idx = text.index(str(gold))
        out.append({
            "question": q,
            "choices": {"text": text, "label": ["A", "B", "C", "D"]},
            "answerKey": "ABCD"[answer_idx],
        })
    return out


def main():
    dst = Path(__file__).resolve().parent.parent / "tests" / "tasks" / "large"
    dst.mkdir(parents=True, exist_ok=True)
    samples = gen_samples()
    p = dst / "synth_arc_300.jsonl"
    p.write_text("\n".join(json.dumps(s) for s in samples) + "\n")
    print(f"wrote {len(samples)} samples to {p}")


if __name__ == "__main__":
    main()
