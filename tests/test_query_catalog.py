"""QUERIES.md must stay in sync with the registry — the catalog is the
line-by-line index of the driver-checkable surface, and a stale one
misstates coverage."""

from __future__ import annotations

import pathlib
import sys


def test_query_catalog_matches_registry():
    root = pathlib.Path(__file__).parent.parent
    sys.path.insert(0, str(root / "tools"))
    from gen_query_catalog import build_catalog

    want = build_catalog()
    got = (root / "QUERIES.md").read_text()
    assert got == want, (
        "QUERIES.md is stale — regenerate with "
        "`python tools/gen_query_catalog.py`"
    )
