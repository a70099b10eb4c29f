"""Surgical pinned-baseline reconstruction (r12 verdict item 3).

The r12 round ended with SPARK_GRAFT_REBASELINE=all, wiping the pinned
per-query baselines for ~160 untouched queries in the same round that
changed a global join strategy — exactly the blind spot pins exist to
catch. This script rebuilds ``baseline_queries`` in BENCH_LOCAL.json
surgically:

- r12-TOUCHED queries (the kernel/ANN tier etc., per the r12 verdict's
  audit) keep their r12 quiet-host values (commit ``d2bde29``);
- everything else carries its r11 pin (commit ``e6ceeab``) forward;
- queries with no pin in either artifact (new since r11) take the
  d2bde29 value when present; otherwise they are left absent and the
  next bench run seeds them.

r13-touched queries are NOT handled here — the final bench run re-seeds
them explicitly via SPARK_GRAFT_REBASELINE=<comma list> so the reset is
deliberate and name-scoped.

Usage:  python scripts/reseed_baselines.py   (run from the repo root)
"""

from __future__ import annotations

import json
import subprocess
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# r12 optimization-window touched set, from the r12 verdict's
# operator-by-operator audit (kernel rewrites + checkpoint fixes +
# driver-side plan-build fixes and their direct inheritors)
R12_TOUCHED = {
    "ann_ivf_pq", "ann_ivf_pq_residual", "ann_ivf_pq_rerank",
    "ann_pq_adc", "ann_ivf_lloyd", "ann_ivf_flat", "ann_ivf_filtered",
    "ann_bruteforce", "ann_lsh", "semantic_dedup",
    "corpus_curation_semdedup", "embedding_near_dupes",
    "embedding_hard_negatives", "ann_ivf_probe_sweep", "ann_recall_eval",
    "dedup_simhash", "skipgram_training_pairs",
    "documents_dsir_selection", "knn_label_vote",
    "ann_dim_truncation_recall", "hybrid_search_rrf",
    "embeddings_semdedup_admission", "ann_ivfpq_streamed_probe",
    "ann_ivfpq_filtered_serve",
}


def _show(ref: str) -> dict:
    out = subprocess.run(
        ["git", "-C", str(REPO), "show", f"{ref}:BENCH_LOCAL.json"],
        capture_output=True, text=True, check=True,
    ).stdout
    return json.loads(out)


def main() -> None:
    r11 = _show("e6ceeab")
    r12 = _show("d2bde29")
    cur_path = REPO / "BENCH_LOCAL.json"
    cur = json.loads(cur_path.read_text())

    r11_pins = r11.get("baseline_queries") or r11["queries"]
    r12_q = r12["queries"]

    rebuilt: dict[str, float] = {}
    src = {"r11_pin": 0, "r12_touched": 0, "r12_seed": 0, "absent": 0}
    for name in cur["queries"]:
        if name in R12_TOUCHED and name in r12_q:
            rebuilt[name] = r12_q[name]
            src["r12_touched"] += 1
        elif name in r11_pins:
            rebuilt[name] = r11_pins[name]
            src["r11_pin"] += 1
        elif name in r12_q:
            rebuilt[name] = r12_q[name]
            src["r12_seed"] += 1
        else:
            src["absent"] += 1

    cur["baseline_queries"] = rebuilt
    cur_path.write_text(json.dumps(cur, indent=1) + "\n")
    print(json.dumps(src))


if __name__ == "__main__":
    main()
