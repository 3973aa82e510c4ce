"""Deprecated env-name compatibility (reference: tests/test_env_compat.py)."""

import logging
import os

import pytest

from open_speech_tpu import config as C


@pytest.mark.parametrize(
    "old,new",
    [
        ("STT_PORT", "OS_PORT"),
        ("STT_API_KEY", "OS_API_KEY"),
        ("STT_MODEL_TTL", "OS_MODEL_TTL"),
        ("STT_STREAM_CHUNK_MS", "OS_STREAM_CHUNK_MS"),
        ("STT_DEFAULT_MODEL", "STT_MODEL"),
        ("TTS_DEFAULT_VOICE", "TTS_VOICE"),
    ],
)
def test_old_names_remap(monkeypatch, old, new):
    os.environ.pop(new, None)
    monkeypatch.setenv(old, "remapped-value")
    try:
        warnings = C._check_deprecated_env_vars()
        assert os.environ[new] == "remapped-value"
        assert warnings[old] == new
    finally:
        # plain pop: the remap wrote directly to os.environ, and
        # monkeypatch.delenv would restore the deleted value at teardown
        os.environ.pop(new, None)


def test_deprecation_warnings_logged(caplog):
    with caplog.at_level(logging.WARNING, logger="open_speech_tpu.config"):
        C.log_deprecation_warnings({"STT_PORT": "OS_PORT"})
    assert any("STT_PORT" in r.message and "OS_PORT" in r.message
               for r in caplog.records)


def test_settings_via_old_names_end_to_end(monkeypatch):
    os.environ.pop("OS_MAX_UPLOAD_MB", None)
    monkeypatch.setenv("STT_MAX_UPLOAD_MB", "7")
    try:
        C._check_deprecated_env_vars()
        s = C.Settings()
        assert s.os_max_upload_mb == 7
        assert s.stt_max_upload_mb == 7  # alias property
    finally:
        os.environ.pop("OS_MAX_UPLOAD_MB", None)


def test_ssl_cert_generation(tmp_path):
    from open_speech_tpu.server.ssl_utils import ensure_ssl_certs

    cert = tmp_path / "c.pem"
    key = tmp_path / "k.pem"
    ensure_ssl_certs(str(cert), str(key))
    assert cert.exists() and key.exists()
    assert b"BEGIN CERTIFICATE" in cert.read_bytes()
    assert oct(key.stat().st_mode & 0o777) == "0o600"
    # idempotent: second call leaves files alone
    before = cert.read_bytes()
    ensure_ssl_certs(str(cert), str(key))
    assert cert.read_bytes() == before
