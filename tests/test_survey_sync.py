"""SURVEY.md §2 must track the registry exactly — a ✅ without an
oracle, or a row without an implementation, is a false claim."""

import re
import sys

import __spark_entry__ as e

sys.path.insert(0, "tools")


def test_priority_is_valid():
    """Every PRIORITY key must be registered (a typo would silently
    demote an operator out of the driver's bounded verification window)
    and the list must be duplicate-free so the 50-entry window holds as
    many distinct operators as intended."""
    from bpaotu_spark import registry

    assert len(set(registry.PRIORITY)) == len(registry.PRIORITY), (
        "duplicate PRIORITY keys"
    )
    unknown = sorted(set(registry.PRIORITY) - set(registry.QUERIES))
    assert unknown == [], f"PRIORITY keys not registered: {unknown}"
    # ordered_queries() enforces the same invariants at driver load time
    ordered = registry.ordered_queries()
    assert list(ordered)[: len(registry.PRIORITY)] == list(registry.PRIORITY)


def test_survey_marks_match_registry():
    qs = set(e.queries())
    oracles = set(e.oracle_sql())
    survey = open("SURVEY.md").read()
    rows = re.findall(
        r"^\| `([a-z_0-9]+)` \| .* \| (✅|rows-only[^|]*) \|$", survey, re.M
    )
    marked = dict(rows)
    assert qs - set(marked) == set(), "operators missing from SURVEY §2"
    assert set(marked) - qs == set(), "SURVEY §2 rows with no implementation"
    for key, mark in marked.items():
        if mark == "✅":
            assert key in oracles, f"{key} marked ✅ but has no oracle"
        else:
            assert key not in oracles, f"{key} marked rows-only but has an oracle"


def test_check_harness_rejects_nonscalar_outputs():
    """Driver-contract guard (r6 lesson, multimodal_features): the
    driver canonicalizer crashes on array/map/struct columns, so the
    local harness must flag them even when values would hash-match."""
    import check

    bad = check.nonscalar_outputs(
        [("id", "bigint"), ("feature", "array<float>")]
    )
    assert bad == [("feature", "array<float>")]
    assert check.nonscalar_outputs(
        [("m", "map<string,int>"), ("s", "struct<a:int>")]
    ) == [("m", "map<string,int>"), ("s", "struct<a:int>")]
    assert check.nonscalar_outputs(
        [("id", "bigint"), ("v", "double"), ("t", "string")]
    ) == []
