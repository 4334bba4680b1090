"""Config-doc drift gate (VERDICT r4 #7).

The reference couples its config docs to the source by literal-including
the annotated config file into sphinx (``doc/configuration.rst:14``) —
its docs can never drift from ``fast/conf.py``. Our
``docs/configuration.md`` is prose; this test provides the equivalent
coupling: every schema key must be documented, and every documented key
must exist in the schema. It fails the suite the moment a key is added,
renamed, or removed on one side only.
"""

import re
from pathlib import Path

from fast_tpu.conf import DEFAULTS, TPU_DEFAULTS

DOC = Path(__file__).resolve().parents[1] / "docs" / "configuration.md"

# engine-read optional keys with no default (absent means off); they are
# documented but deliberately not in DEFAULTS (engine.py init_atmos)
OPTIONAL_KEYS = {"AZIMUT_SAT", "ANISO_DL"}


def _doc_text():
    return DOC.read_text()


def test_every_schema_key_documented():
    doc = _doc_text()
    missing = sorted(k for k in list(DEFAULTS) + list(TPU_DEFAULTS)
                     if f"`{k}`" not in doc)
    assert not missing, (
        f"config keys missing from docs/configuration.md: {missing} — "
        "add a table row (this doc is the user-facing schema reference)")


def test_every_documented_key_exists():
    doc = _doc_text()
    toks = set(re.findall(r"`([A-Z][A-Z0-9_]{2,})`", doc))
    # FAST_TPU_* are process-level env switches, not config keys
    toks = {t for t in toks if not t.startswith("FAST_TPU_")}
    known = set(DEFAULTS) | set(TPU_DEFAULTS) | OPTIONAL_KEYS
    stale = sorted(toks - known)
    assert not stale, (
        f"docs/configuration.md documents keys not in the schema: {stale}"
        " — remove the row or add the key to conf.py")


def test_optional_keys_actually_read():
    # the allow-list above must stay honest: each optional key is read
    # somewhere in the engine
    src = (Path(__file__).resolve().parents[1] / "fast_tpu"
           / "engine.py").read_text()
    for k in OPTIONAL_KEYS:
        assert k in src, f"optional key {k} is no longer read by engine.py"
