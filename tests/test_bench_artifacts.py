"""Drift guard for the committed benchmark artifact (VERDICT r4 weak #1).

Three consecutive rounds ended with a claims/artifact drift at the snapshot
commit: a measurement-policy change landed AFTER the last benchmark
regeneration, so ``benchmarks/bench_details.json`` carried rows (or row
names) that the suite at HEAD would no longer emit. This test makes that
drift class fail CI mechanically: ``run_all.expected_row_names()`` derives
the full ordered row list from the same constants and policies
(``transformer_accum_steps`` et al.) that ``main()`` benches with — without
running anything — and the committed artifact must match it exactly.

``run_all.main()`` itself refuses to write an artifact whose rows diverge
from the same spec, so the chain is closed in both directions:
suite-vs-spec at bench time (on TPU), artifact-vs-spec here (cheap, in CI).
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_run_all():
    sys.path.insert(0, os.path.join(REPO, "benchmarks"))
    try:
        import run_all
    finally:
        sys.path.pop(0)
    return run_all


def test_bench_details_rows_match_head_suite():
    run_all = _load_run_all()
    with open(os.path.join(REPO, "benchmarks", "bench_details.json")) as f:
        committed = [r["benchmark"] for r in json.load(f)["results"]]
    # The native C++ loader row is environment-conditional; accept either.
    candidates = [run_all.expected_row_names(native_loader=True),
                  run_all.expected_row_names(native_loader=False)]
    if committed not in candidates:
        expect = candidates[0]
        only_committed = [n for n in committed if n not in expect]
        only_expected = [n for n in expect if n not in committed]
        raise AssertionError(
            "bench_details.json is stale relative to the suite at HEAD — "
            "rerun `PYTHONPATH=/root/repo:/root/.axon_site python "
            "benchmarks/run_all.py` on the TPU and commit the artifact. "
            f"committed-not-expected={only_committed} "
            f"expected-not-committed={only_expected}"
        )


def test_expected_row_names_track_accum_policy():
    """The accum row names must come FROM the policy, not be hardcoded —
    that coupling is what makes a policy change fail this guard."""
    run_all = _load_run_all()
    from artspeech_tpu.train.step import transformer_accum_steps

    names = run_all.expected_row_names()
    k_f32 = transformer_accum_steps(run_all.TR_B_BIG)
    k_bf16 = transformer_accum_steps(run_all.TR_B_BIG, dtype="bfloat16")
    assert f"transformer_train_step_b{run_all.TR_B_BIG}_accum{k_f32}" in names
    assert (
        f"transformer_train_step_b{run_all.TR_B_BIG}_accum{k_bf16}_bf16" in names
    )
    assert len(names) == len(set(names))
