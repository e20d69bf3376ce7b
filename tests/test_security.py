"""Server security stack: keys, tokens, rate limits, allowlists, factory."""

import time

import pytest

from nanowakeword_tpu.interpreter.server_security import (
    KeyStore, SecurityConfig, SecurityManager, TokenSigner, build_security,
    decode_token_request, encode_token_request, is_token_request)


class TestKeyStore:
    def test_verify_roundtrip(self):
        ks = KeyStore(["secret-1", "secret-2"])
        assert ks.verify("secret-1")
        assert ks.verify("secret-2")
        assert not ks.verify("wrong")

    def test_hashes_are_salted(self):
        assert KeyStore.hash_key("k") != KeyStore.hash_key("k")

    def test_malformed_stored_hash(self):
        assert not KeyStore.check("k", "not-a-valid-hash")


class TestTokens:
    def test_issue_verify(self):
        signer = TokenSigner("secret")
        token = signer.issue(ttl=60)
        assert signer.verify(token)

    def test_expired(self):
        signer = TokenSigner("secret")
        token = signer.issue(ttl=-1)
        assert not signer.verify(token)

    def test_tampered(self):
        signer = TokenSigner("secret")
        token = signer.issue(ttl=60)
        expiry, sig = token.split(".")
        assert not signer.verify(f"{int(expiry) + 9999}.{sig}")
        assert not signer.verify("garbage")
        assert not TokenSigner("other").verify(token)


class TestRateLimiting:
    def test_window_and_ban(self):
        mgr = SecurityManager(SecurityConfig(rate_limit=3, rate_window=60,
                                             ban_duration=300))
        ip = "10.0.0.1"
        assert all(mgr.record_request(ip) for _ in range(3))
        assert not mgr.record_request(ip)      # 4th breaches
        assert mgr.is_banned(ip)
        assert not mgr.is_banned("10.0.0.2")

    def test_no_ban_when_duration_zero(self):
        mgr = SecurityManager(SecurityConfig(rate_limit=1, rate_window=60,
                                             ban_duration=0))
        mgr.record_request("ip")
        assert not mgr.record_request("ip")
        assert not mgr.is_banned("ip")

    def test_disabled_always_allows(self):
        mgr = SecurityManager(SecurityConfig())
        assert all(mgr.record_request("ip") for _ in range(100))


class TestAllowlist:
    def test_cidr(self):
        mgr = SecurityManager(SecurityConfig(
            ip_allowlist=["192.168.1.0/24", "10.0.0.5"]))
        assert mgr.ip_allowed("192.168.1.77")
        assert mgr.ip_allowed("10.0.0.5")
        assert not mgr.ip_allowed("10.0.0.6")
        assert not mgr.ip_allowed("not-an-ip")

    def test_empty_allows_all(self):
        mgr = SecurityManager(SecurityConfig())
        assert mgr.ip_allowed("1.2.3.4")


class TestConnectionCap:
    def test_cap(self):
        mgr = SecurityManager(SecurityConfig(max_connections=2))
        assert mgr.connection_allowed()
        mgr.on_connect()
        mgr.on_connect()
        assert not mgr.connection_allowed()
        mgr.on_disconnect()
        assert mgr.connection_allowed()


class TestTokenWire:
    def test_roundtrip(self):
        msg = encode_token_request("my-key")
        assert is_token_request(msg)
        assert decode_token_request(msg) == "my-key"

    def test_data_message_is_not_token_request(self):
        assert not is_token_request(b"\x01abcdef")


class TestFactory:
    def test_all_defaults_returns_none(self):
        assert build_security() is None

    def test_any_feature_builds_manager(self):
        mgr = build_security(api_keys=["k"])
        assert isinstance(mgr, SecurityManager)
        assert mgr.verify_api_key("k")
        assert not mgr.verify_api_key("x")

    def test_summary(self):
        cfg = SecurityConfig(api_keys=["k"], rate_limit=10,
                             ip_allowlist=["10.0.0.0/8"], max_connections=5)
        s = cfg.summary()
        assert "API-key" in s and "rate-limit" in s and "allowlist" in s
        assert SecurityConfig().summary() == "none (open server)"
