"""The evidence-staleness gate (scripts/evidence_report.py): the
enforced form of the driver-window rotation — a frozen rotation ages
evidence silently (round 8), this gate makes it loud. Detection logic
is tested on synthetic correctness files; the real-repo run is a smoke
check only, because the current round's correctness file lands AFTER
these tests run."""

import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location(
    "evidence_report", os.path.join(REPO, "scripts", "evidence_report.py")
)
er = importlib.util.module_from_spec(spec)
spec.loader.exec_module(er)


class FakeSpec:
    def __init__(self, oracle):
        self.oracle = oracle


def test_gate_flags_frozen_rotation(tmp_path):
    # q_old last seen r02 with newest r08 → age 6 > 5 → gate fails;
    # q_fresh at r08 and rows-only q_na never gate
    for r, names in [(2, ["q_old", "q_fresh"]), (8, ["q_fresh"])]:
        (tmp_path / f"CORRECTNESS_r{r:02d}.json").write_text(
            json.dumps({n: {"hash_match": True} for n in names})
        )
    rounds = er.correctness_rounds(str(tmp_path))
    assert rounds == {2: {"q_old", "q_fresh"}, 8: {"q_fresh"}}
    report = er.build_report(
        rounds,
        {
            "q_old": FakeSpec("SELECT 1"),
            "q_fresh": FakeSpec("SELECT 1"),
            "q_na": FakeSpec(None),
            "q_new": FakeSpec("SELECT 1"),
        },
    )
    bad = er.stale_entries(report, max_age=5, strict=False, front=frozenset({"q_new"}))
    assert len(bad) == 1 and bad[0].startswith("q_old:")
    # a never-checked query is exempt only while the rotation FRONTS it
    # (it gets its first row this round); one that slipped out of the
    # window is the rotation failure the gate exists for
    slipped = er.stale_entries(report, max_age=5, strict=False, front=frozenset())
    assert any(b.startswith("q_new:") for b in slipped)
    strict = er.stale_entries(
        report, max_age=5, strict=True, front=frozenset({"q_new"})
    )
    assert any(b.startswith("q_new:") for b in strict)
    assert not any(b.startswith("q_na:") for b in strict)  # rows-only exempt


def test_gate_passes_steady_state_rotation(tmp_path):
    # 4-round rotation over 8 queries, window 2: ages 0..3 all pass
    names = [f"q{i}" for i in range(8)]
    for r in range(1, 5):
        (tmp_path / f"CORRECTNESS_r{r:02d}.json").write_text(
            json.dumps({n: {} for n in names[(r - 1) * 2 : r * 2]})
        )
    report = er.build_report(
        er.correctness_rounds(str(tmp_path)),
        {n: FakeSpec("SELECT 1") for n in names},
    )
    assert er.stale_entries(report, max_age=5, strict=False) == []


def test_real_repo_report_builds():
    # smoke: every file parses, and any oracled query with NO driver
    # row yet must sit inside the upcoming driver window (a query
    # registered this round fronts the ordering and gets its first row
    # in this round's run; one outside the window would never get one)
    from dynamodb_pitr_restore_cdc_spark.registry import all_queries

    rounds = er.correctness_rounds(REPO)
    assert rounds, "no CORRECTNESS files found"
    specs = all_queries()
    report = er.build_report(rounds, specs)
    front = set(list(specs)[: er.WINDOW])
    never = [
        n
        for n, q in report["queries"].items()
        if q["oracled"] and q["last_round"] is None
    ]
    stranded = [n for n in never if n not in front]
    assert stranded == [], f"never-checked queries outside the window: {stranded}"
