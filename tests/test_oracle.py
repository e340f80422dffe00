"""Primary judged gate, replicated locally: every declared query in the
registry hash-matches its DuckDB oracle on the test scale factor
(SURVEY.md §5 rebuild strategy, item 1)."""

from __future__ import annotations

import pytest

from mycenae_spark.registry import ORACLE, QUERIES

from tests.conftest import SF_DIR, assert_matches_oracle


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_match(spark, ddb, name):
    df = QUERIES[name](spark, SF_DIR)
    assert_matches_oracle(df, ddb, ORACLE[name], name)


def test_oracle_output_types_driver_safe(ddb):
    """Registry-wide guard for the r7 pack_sequences class of driver-vs-
    local divergence: no oracle may emit HUGEINT / UHUGEINT / wide-DECIMAL
    columns (DuckDB's window-sum promotion), because the driver's pandas
    rendering turns them into floats while fetchall() (this replica) turns
    them into ints — a hash mismatch on value-identical results.  Binding
    the relation is enough to read types; nothing executes."""
    from tests.conftest import assert_oracle_types_driver_safe

    for name, sql in ORACLE.items():
        assert_oracle_types_driver_safe(ddb.sql(sql), name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE)))
def test_rows_only(spark, name):
    """Queries without an oracle (approximate by construction) must still
    run and return a stable schema."""
    df = QUERIES[name](spark, SF_DIR)
    assert df.columns
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(QUERIES) >= set(ORACLE)


def test_rounding_convention_generated_not_copied():
    """Every float canonicalization in every oracle comes from the ONE spec
    builder (util.sql_round): no unexpanded macros, and every `round(` in
    the final SQL is the canonical `(round((X) + 1e-9, d) + 0.0)` shape —
    convention drift between hand-written strings is structurally
    impossible."""
    import re

    from mycenae_spark.registry.util import expand_rounding_macros, sql_round

    for name, sql in ORACLE.items():
        assert not re.search(r"\bround[246]\(", sql), name
        for m in re.finditer(r"\bround\(", sql):
            assert sql[m.start() - 1] == "(" and sql[m.end()] == "(", (
                name, sql[max(0, m.start() - 20) : m.end() + 20])
            # find the close of the inner (X) group; the canonical tail
            # " + 1e-9, d) + 0.0)" must follow immediately
            depth, i = 1, m.end() + 1
            while depth:
                depth += {"(": 1, ")": -1}.get(sql[i], 0)
                i += 1
            assert re.match(r" \+ 1e-9, [246]\) \+ 0\.0\)", sql[i:]), (
                name, sql[i : i + 25])

    # the expander is exact on nesting
    assert (
        expand_rounding_macros("round4(a(b) + round6(c))")
        == "(round((a(b) + (round((c) + 1e-9, 6) + 0.0)) + 1e-9, 4) + 0.0)"
    )
    assert sql_round("x", 4) == "(round((x) + 1e-9, 4) + 0.0)"


def test_verification_window_composition():
    """The driver checks the first DRIVER_WINDOW registry entries per
    round.  Since round 8 the rotation is DERIVED from the committed
    CORRECTNESS_r*.json artifacts (registry._driver_history); this test
    pins the invariants of that derivation:

    * every red id (driver-checked, not green) sits inside the window;
    * every never-checked id sits inside the window, after the reds,
      unless reds + new ids alone overflow it;
    * green ids are ordered stalest-round-first (monotone);
    * the rotation is a permutation of the declared registry (nothing
      dropped, nothing invented)."""
    from mycenae_spark.registry import (
        _ALL_QUERIES,
        _HISTORY,
        DRIVER_WINDOW,
        REDECLARED,
        _rotation_key,
    )

    ids = list(QUERIES)
    assert set(ids) == set(_ALL_QUERIES)
    assert ids == sorted(ids, key=_rotation_key)

    def stale_redeclared(k):
        # a green predating a semantic redeclaration ranks as unchecked
        return k in _HISTORY and _HISTORY[k][0] < REDECLARED.get(k, 0)

    window = set(ids[:DRIVER_WINDOW])
    reds = [k for k in ids if k in _HISTORY and not _HISTORY[k][1]]
    never = [k for k in ids if k not in _HISTORY or stale_redeclared(k)]
    if len(reds) + len(never) <= DRIVER_WINDOW:
        out = [k for k in reds + never if k not in window]
        assert not out, f"red/never-checked ids outside the window: {out}"

    green_rounds = [
        _HISTORY[k][0]
        for k in ids
        if k in _HISTORY and _HISTORY[k][1] and not stale_redeclared(k)
    ]
    assert green_rounds == sorted(green_rounds), (
        "green ids are not stalest-first"
    )


def test_driver_history_reads_committed_artifacts():
    """The rotation's ground truth: the committed CORRECTNESS files must
    parse, and known r7 facts must be reflected — pack_sequences was the
    r7 red (so it re-checks at the window front) and the 21-id stale tail
    (r1/r2-only driver evidence) precedes every r5+ green."""
    from mycenae_spark.registry import _HISTORY, DRIVER_WINDOW

    assert _HISTORY, "no CORRECTNESS_r*.json artifacts found"
    ids = list(QUERIES)
    rnd, green = _HISTORY["pack_sequences"]
    if rnd == 7 and not green:  # true until the r8 driver row lands
        assert ids.index("pack_sequences") < DRIVER_WINDOW
    # a couple of known-stale family members must precede known r7 greens
    for stale, fresh in (("dedup_exact", "dedup_semantic"),
                         ("sim_topk", "knn_graph_topk"),
                         ("text_tokens", "text_langid_trigram")):
        if _HISTORY[stale][0] < _HISTORY[fresh][0]:
            assert ids.index(stale) < ids.index(fresh), (stale, fresh)


def test_driver_history_flags_missing_artifacts(tmp_path):
    """r8 ADVICE: a zero-artifact root (wheel install / mis-located repo)
    must not SILENTLY degrade the rotation to declaration order — the
    helper sets the module flag (and warns).  In this repo the artifacts
    exist, so the import-time flag is False."""
    import mycenae_spark.registry as reg

    assert reg.NO_DRIVER_ARTIFACTS is False
    try:
        hist = reg._driver_history(root=str(tmp_path))
        assert hist == {}
        assert reg.NO_DRIVER_ARTIFACTS is True
    finally:
        reg.NO_DRIVER_ARTIFACTS = False
