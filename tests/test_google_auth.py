"""Google auth flow-selection + refresh state machine (S32 neighbor,
ref d2b_data/Google_Token_MNG.py:54-219) — driven entirely offline via
the injectable exchange/clock, like R1-R5 drive retry policies."""

from __future__ import annotations

import pytest

from d2b_dataframework_spark.core.config import TokenStore
from d2b_dataframework_spark.sources.google_auth import (
    AuthError,
    Credentials,
    GoogleAuthManager,
    resolve_with_store,
)


# offline auth state machine — no SQL expressions
pytestmark = pytest.mark.single_leg

class FakeExchange:
    """Records grants; returns canned token responses per grant_type."""

    def __init__(self, responses: dict | None = None):
        self.grants: list[dict] = []
        self.responses = responses or {}

    def __call__(self, grant: dict) -> dict:
        self.grants.append(grant)
        return self.responses.get(
            grant["grant_type"],
            {"access_token": f"at-{len(self.grants)}", "expires_in": 3600},
        )


@pytest.fixture()
def mgr():
    ex = FakeExchange()
    clock = {"now": 1_000_000.0}
    m = GoogleAuthManager(ex, clock=lambda: clock["now"])
    return m, ex, clock


def test_service_account_key_wins_over_adc(mgr):
    m, ex, _ = mgr
    creds = m.resolve(
        use_service_account=True,
        sa_key={"client_email": "svc@proj.iam"},
        adc={"access_token": "ambient"},
        scopes=["s1"],
    )
    assert creds.source == "service_account"
    assert ex.grants[0]["grant_type"].endswith("jwt-bearer")
    assert ex.grants[0]["assertion"] == "svc@proj.iam"


def test_adc_fallback_when_no_key(mgr):
    m, ex, _ = mgr
    creds = m.resolve(
        use_service_account=True, adc={"access_token": "ambient", "project": "p1"}
    )
    assert creds.source == "adc"
    assert creds.extra["project"] == "p1"
    assert ex.grants == []  # ambient creds: no token exchange


def test_service_account_without_key_or_adc_errors(mgr):
    m, _, _ = mgr
    with pytest.raises(AuthError, match="no key and no ADC"):
        m.resolve(use_service_account=True)


def test_stored_token_loads_without_exchange(mgr):
    m, ex, _ = mgr
    creds = m.resolve(
        token={"access_token": "saved", "refresh_token": "r1", "expiry": 2_000_000.0},
        scopes=["s1"],
    )
    assert creds.source == "stored_token"
    assert creds.access_token == "saved"
    assert ex.grants == []


def test_oauth_requires_scopes(mgr):
    m, _, _ = mgr
    with pytest.raises(AuthError, match="scopes are required"):
        m.resolve(token={"access_token": "t"})


def test_interactive_flow_exchanges_pasted_code(mgr):
    m, ex, _ = mgr
    seen_urls = []

    def authorize(url: str) -> str:
        seen_urls.append(url)
        return "code-123"

    creds = m.resolve(
        secrets={"client_id": "cid", "client_secret": "cs"},
        scopes=["s1", "s2"],
        authorize=authorize,
    )
    assert creds.source == "oauth_flow"
    assert "cid" in seen_urls[0] and "s1+s2" in seen_urls[0]
    assert ex.grants[0] == {
        "grant_type": "authorization_code",
        "code": "code-123",
        "client_id": "cid",
        "client_secret": "cs",
    }


def test_flow_without_secrets_errors(mgr):
    m, _, _ = mgr
    with pytest.raises(AuthError, match="client secret is required"):
        m.resolve(scopes=["s1"], authorize=lambda url: "c")


def test_public_api_unauthenticated(mgr):
    m, ex, _ = mgr
    creds = m.resolve(wants_auth=False)
    assert creds.source == "public" and creds.access_token is None
    assert ex.grants == []


def test_refresh_only_when_stale(mgr):
    m, ex, clock = mgr
    creds = Credentials(
        access_token="a", refresh_token="r1", expiry=1_000_500.0, source="stored_token"
    )
    # 500s to expiry > 300s skew → fresh, untouched.
    assert m.ensure_fresh(creds) is creds
    # Advance past expiry-skew → refresh grant with the stored token.
    clock["now"] = 1_000_300.0
    refreshed = m.ensure_fresh(creds)
    assert refreshed.source == "refreshed"
    assert ex.grants[0] == {"grant_type": "refresh_token", "refresh_token": "r1"}
    assert refreshed.expiry == 1_000_300.0 + 3600
    # Google keeps the refresh token unless rotated.
    assert refreshed.refresh_token == "r1"


def test_expired_without_refresh_token_errors(mgr):
    m, _, clock = mgr
    clock["now"] = 2_000_000.0
    creds = Credentials(access_token="a", expiry=1_000_000.0, source="stored_token")
    with pytest.raises(AuthError, match="no refresh token"):
        m.ensure_fresh(creds)


def test_store_cycle_flow_then_load_then_refresh(mgr, tmp_path):
    """get_credentials' file cycle: first run flows + saves; second run
    loads the saved token silently; an expired third run refreshes and
    persists the new expiry."""
    m, ex, clock = mgr
    ex.responses["authorization_code"] = {
        "access_token": "at-1", "expires_in": 3600, "refresh_token": "rt-1",
    }
    store = TokenStore(str(tmp_path))

    first = resolve_with_store(
        m, store, "ga4",
        secrets={"client_id": "cid"}, scopes=["s1"], authorize=lambda url: "c",
    )
    assert first.source == "oauth_flow"
    assert store.load("ga4")["access_token"] == first.access_token

    second = resolve_with_store(m, store, "ga4", scopes=["s1"])
    assert second.source == "stored_token"  # no new flow, no authorize needed
    assert [g["grant_type"] for g in ex.grants] == ["authorization_code"]

    clock["now"] += 7200  # past expires_in=3600
    ex.responses["refresh_token"] = {"access_token": "at-new", "expires_in": 3600}
    third = resolve_with_store(m, store, "ga4", scopes=["s1"])
    assert third.source == "refreshed" and third.access_token == "at-new"
    assert store.load("ga4")["access_token"] == "at-new"
    assert store.load("ga4")["expiry"] == clock["now"] + 3600
