"""SURVEY.md §2 must track the registry exactly — a ✅ without an
oracle, or a row without an implementation, is a false claim."""

import re

import __spark_entry__ as e


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
