"""Self-signed TLS bootstrap behaviors (reference: tests/test_ssl_utils.py).

Real-openssl generation plus the regeneration/no-op/permission rules the
server relies on at first start.
"""

from __future__ import annotations

import os
import stat
import subprocess

import pytest

from open_speech_tpu.server.ssl_utils import ensure_ssl_certs


def _paths(tmp_path):
    return str(tmp_path / "cert.pem"), str(tmp_path / "key.pem")


def test_noop_when_both_exist(tmp_path, monkeypatch):
    cert, key = _paths(tmp_path)
    for p in (cert, key):
        with open(p, "w") as f:
            f.write("sentinel")
    called = []
    monkeypatch.setattr(
        subprocess, "run", lambda *a, **k: called.append(a)
    )
    ensure_ssl_certs(cert, key)
    assert not called
    assert open(cert).read() == "sentinel"


def test_generates_real_pair_when_missing(tmp_path):
    cert, key = _paths(tmp_path)
    ensure_ssl_certs(cert, key)
    assert os.path.isfile(cert) and os.path.isfile(key)
    # openssl accepts its own output
    out = subprocess.run(
        ["openssl", "x509", "-in", cert, "-noout", "-subject", "-ext",
         "subjectAltName"],
        capture_output=True, text=True, check=True,
    ).stdout
    assert "open-speech" in out
    assert "localhost" in out and "127.0.0.1" in out


def test_key_and_cert_permissions(tmp_path):
    cert, key = _paths(tmp_path)
    ensure_ssl_certs(cert, key)
    assert stat.S_IMODE(os.stat(key).st_mode) == 0o600
    assert stat.S_IMODE(os.stat(cert).st_mode) == 0o644


def test_creates_parent_dirs(tmp_path):
    cert = str(tmp_path / "a" / "b" / "cert.pem")
    key = str(tmp_path / "a" / "c" / "key.pem")
    ensure_ssl_certs(cert, key)
    assert os.path.isfile(cert) and os.path.isfile(key)


@pytest.mark.parametrize("present", ["cert", "key"])
def test_regenerates_when_half_missing(tmp_path, present):
    cert, key = _paths(tmp_path)
    stale = cert if present == "cert" else key
    with open(stale, "w") as f:
        f.write("stale half")
    ensure_ssl_certs(cert, key)
    # both exist and the stale half was replaced by real PEM
    assert os.path.isfile(cert) and os.path.isfile(key)
    assert "BEGIN" in open(stale).read()


def test_openssl_failure_raises(tmp_path, monkeypatch):
    cert, key = _paths(tmp_path)

    def boom(*a, **k):
        raise subprocess.CalledProcessError(1, "openssl", stderr=b"bad")

    monkeypatch.setattr(subprocess, "run", boom)
    with pytest.raises(subprocess.CalledProcessError):
        ensure_ssl_certs(cert, key)
    assert not os.path.exists(cert) and not os.path.exists(key)


def test_openssl_missing_raises(tmp_path, monkeypatch):
    cert, key = _paths(tmp_path)

    def missing(*a, **k):
        raise FileNotFoundError("openssl")

    monkeypatch.setattr(subprocess, "run", missing)
    with pytest.raises(FileNotFoundError):
        ensure_ssl_certs(cert, key)
