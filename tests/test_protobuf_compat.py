"""protobuf_compat.ensure_protobuf — the tws state-protocol enabler."""

from __future__ import annotations

import os

from qa_data_pipeline_rag_llm_spark.protobuf_compat import (
    KNOWN_RUNTIME_DIRS,
    ensure_protobuf,
)


def test_ensure_protobuf_reports_and_prepares():
    """Where ANY runtime exists (wheel or on-disk SDK), ensure returns
    True and google.protobuf is importable afterwards; when it used the
    SDK copy, the worker env (PYTHONPATH + version-check escape hatch)
    must be exported so python workers can speak the state protocol."""
    ok = ensure_protobuf()
    if not ok:
        # legitimate only on a host with neither a wheel nor the SDK
        assert not any(
            os.path.isdir(os.path.join(d, "google", "protobuf"))
            for d in KNOWN_RUNTIME_DIRS
        )
        return
    import google.protobuf  # noqa: F401 — must import after True

    mod_path = __import__("google.protobuf", fromlist=["x"]).__file__
    if any(mod_path.startswith(d) for d in KNOWN_RUNTIME_DIRS):
        # SDK-copy mode: worker propagation env must be in place
        assert (
            os.environ.get("TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK")
            == "true"
        )
        assert any(
            d in os.environ.get("PYTHONPATH", "").split(os.pathsep)
            for d in KNOWN_RUNTIME_DIRS
        )


def test_ensure_protobuf_idempotent():
    assert ensure_protobuf() == ensure_protobuf()
