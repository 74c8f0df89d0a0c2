"""Citation lint (VERDICT r05 #2/#4): the repo's parity discipline is
"every reference claim cites file:line into /root/reference/" — so a
cited reference filename that does not EXIST in the reference listing is
a fabricated citation (the r5 finding: five docstrings cited invented
`Mise-En-Forme*.py` files). This gate extracts every reference-style
filename token from the package source and asserts it resolves against
the real /root/reference directory (fnmatch, so `REDDIT-*.py` globs are
legal)."""

from __future__ import annotations

import fnmatch
import pathlib
import re

REFERENCE_DIR = pathlib.Path("/root/reference")
PACKAGE = pathlib.Path(__file__).parents[1] / "qa_data_pipeline_rag_llm_spark"

# A cited token is reference-style if it could only name a reference
# file: dashes are illegal in python module names (so every local module
# is dash-free), and the reference's dash-free files all match the
# app*/main*/config_* prefixes. Non-.py extensions (ipynb/yml/txt) are
# ALWAYS reference-style — the package has no such files, so any cited
# one must resolve (an .ipynb fabrication slipped past the .py-only
# pattern in r7).
_TOKEN = re.compile(r"[A-Za-z0-9_*?-]+\.(?:py|ipynb|yml|yaml|txt|md)\b")
_REF_STYLE = re.compile(
    r"(-)|(^app\d*\.py$)|(^main)|(^config_)|(\.(?:ipynb|yml|yaml|txt)$)"
)


def _reference_names() -> list[str]:
    return [p.name for p in REFERENCE_DIR.iterdir()]


def test_all_reference_citations_exist():
    if not REFERENCE_DIR.is_dir():  # sandboxed CI without the reference
        import pytest

        pytest.skip("/root/reference not mounted")
    names = _reference_names()
    bad: list[str] = []
    for path in sorted(PACKAGE.rglob("*.py")):
        text = path.read_text()
        for tok in set(_TOKEN.findall(text)):
            if not _REF_STYLE.search(tok):
                continue  # local module / generic name, not a citation
            if not any(fnmatch.fnmatch(n, tok) for n in names):
                bad.append(f"{path.relative_to(PACKAGE.parent)}: {tok}")
    assert not bad, f"citations to nonexistent reference files: {bad}"
