"""Google auth flow selection + token lifecycle (S32-adjacent; K6 uses
:class:`~d2b_dataframework_spark.core.config.TokenStore` for persistence).

Reference: d2b_data/Google_Token_MNG.py:54-219 — create_api's selection
order (service-account file → ADC when ``use_sa``; stored OAuth token →
interactive flow otherwise; unauthenticated public build as the last
resort) and get_credentials' token-file/flow/save cycle. The reference
delegates expiry/refresh to oauth2client's authorized http; here the
refresh state machine is explicit so it can be driven offline.

This is a MODEL of the flow, not a port of google-auth: the network
step (code/refresh-token/JWT exchange against the oauth2 endpoint) is
an injectable callable, the clock is injectable, and every selection
branch returns a :class:`Credentials` tagged with its source — so the
fake-transport test kernel (sources.rest.FakeTransport) can script
expiry, refresh, and flow-selection scenarios the way R1-R5 script
retry policies.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field, replace
from typing import Any, Callable


class AuthError(Exception):
    """Unrecoverable auth-state error (missing secrets, unrefreshable)."""


@dataclass(frozen=True)
class Credentials:
    """Resolved credentials + provenance.

    ``expiry`` is epoch seconds (0 = never expires, e.g. public);
    ``source`` records which selection branch produced them:
    ``service_account`` | ``adc`` | ``stored_token`` | ``oauth_flow`` |
    ``refreshed`` | ``public``.
    """

    access_token: str | None
    source: str
    refresh_token: str | None = None
    expiry: float = 0.0
    scopes: tuple[str, ...] = ()
    extra: dict[str, Any] = field(default_factory=dict)

    def to_token(self) -> dict:
        """Serializable form for TokenStore (K6)."""
        return {
            "access_token": self.access_token,
            "refresh_token": self.refresh_token,
            "expiry": self.expiry,
            "scopes": list(self.scopes),
            "source": self.source,
        }

    @classmethod
    def from_token(cls, token: dict) -> "Credentials":
        return cls(
            access_token=token.get("access_token"),
            refresh_token=token.get("refresh_token"),
            expiry=float(token.get("expiry", 0.0)),
            scopes=tuple(token.get("scopes", ())),
            source="stored_token",
        )


class GoogleAuthManager:
    """Flow selection + refresh over an injectable exchange/clock.

    ``exchange(grant: dict) -> dict`` stands in for the POST to the
    oauth2 token endpoint; it receives ``{"grant_type": ...}`` plus the
    grant-specific fields and returns ``{"access_token", "expires_in",
    ["refresh_token"]}``. In production this is a real HTTP call; in
    tests a FakeTransport-style callable.
    """

    def __init__(
        self,
        exchange: Callable[[dict], dict],
        clock: Callable[[], float] = time.time,
        expiry_skew: float = 300.0,
    ):
        self.exchange = exchange
        self.clock = clock
        self.expiry_skew = expiry_skew

    # -- selection (Google_Token_MNG.create_api:180-219) ------------------

    def resolve(
        self,
        *,
        use_service_account: bool = False,
        sa_key: dict | None = None,
        adc: dict | None = None,
        token: dict | None = None,
        secrets: dict | None = None,
        scopes: list[str] | None = None,
        authorize: Callable[[str], str] | None = None,
        wants_auth: bool = True,
    ) -> Credentials:
        """Pick the auth flow in the reference's order.

        1. ``use_service_account``: key material present → SA assertion
           grant; else ADC (ambient credentials, ref :182-189).
        2. ``wants_auth`` with a stored ``token`` → load it (refresh is
           the caller's ``ensure_fresh``); scopes are REQUIRED for any
           OAuth path (ref ValueError :196-197).
        3. No token but OAuth ``secrets`` → interactive flow:
           ``authorize(auth_url) -> code`` (the "visit url, paste code"
           step, ref :103-133), then code exchange; missing secrets is
           an error (ref :107-110).
        4. ``wants_auth=False`` → unauthenticated public API (ref :215).
        """
        if use_service_account:
            if sa_key is not None:
                granted = self.exchange(
                    {
                        "grant_type": "urn:ietf:params:oauth:grant-type:jwt-bearer",
                        "assertion": sa_key.get("client_email", ""),
                        "scope": " ".join(scopes or ()),
                    }
                )
                return self._from_grant(granted, "service_account", scopes)
            if adc is None:
                raise AuthError("service-account requested but no key and no ADC")
            return Credentials(
                access_token=adc.get("access_token", "adc"),
                expiry=float(adc.get("expiry", self.clock() + 3600)),
                scopes=tuple(scopes or ()),
                source="adc",
                extra={"project": adc.get("project")},
            )

        if not wants_auth:
            return Credentials(access_token=None, source="public")

        if not scopes:
            raise AuthError("scopes are required when using OAuth authentication")

        if token is not None:
            return Credentials.from_token(token)

        if secrets is None:
            raise AuthError(
                "a client secret is required because the OAuth token does not exist"
            )
        if authorize is None:
            raise AuthError("interactive flow needs an authorize callback")
        auth_url = (
            "https://accounts.google.com/o/oauth2/auth?client_id="
            + secrets.get("client_id", "")
            + "&scope="
            + "+".join(scopes)
        )
        code = authorize(auth_url)
        granted = self.exchange(
            {
                "grant_type": "authorization_code",
                "code": code,
                "client_id": secrets.get("client_id", ""),
                "client_secret": secrets.get("client_secret", ""),
            }
        )
        return self._from_grant(granted, "oauth_flow", scopes)

    # -- refresh (oauth2client's implicit behavior, made explicit) --------

    def is_fresh(self, creds: Credentials) -> bool:
        """No expiry (0) never expires; otherwise fresh until
        ``expiry - expiry_skew``."""
        return creds.expiry == 0.0 or self.clock() < creds.expiry - self.expiry_skew

    def ensure_fresh(self, creds: Credentials) -> Credentials:
        """Return ``creds`` unchanged while fresh; otherwise refresh via
        the refresh-token grant. Unrefreshable expiry (no refresh token)
        is an AuthError — the caller must re-run the interactive flow,
        exactly the reference's behavior when a stored token dies."""
        if self.is_fresh(creds):
            return creds
        if not creds.refresh_token:
            raise AuthError(
                f"credentials from {creds.source} expired and have no refresh token"
            )
        granted = self.exchange(
            {
                "grant_type": "refresh_token",
                "refresh_token": creds.refresh_token,
            }
        )
        refreshed = self._from_grant(granted, "refreshed", list(creds.scopes))
        if refreshed.refresh_token is None:
            # Google keeps the original refresh token unless rotated.
            refreshed = replace(refreshed, refresh_token=creds.refresh_token)
        return refreshed

    def _from_grant(
        self, granted: dict, source: str, scopes: list[str] | None
    ) -> Credentials:
        return Credentials(
            access_token=granted["access_token"],
            refresh_token=granted.get("refresh_token"),
            expiry=self.clock() + float(granted.get("expires_in", 3600)),
            scopes=tuple(scopes or ()),
            source=source,
        )


def resolve_with_store(
    manager: GoogleAuthManager,
    store,
    service: str,
    **kwargs,
) -> Credentials:
    """TokenStore-backed resolve (get_credentials' file cycle, ref
    :103-133): load the stored token when present, resolve, ensure
    freshness, and persist whenever the token changed (new flow or
    refresh) — so the next run starts from the saved state."""
    stored = store.load(service)
    creds = manager.resolve(token=stored, **kwargs)
    fresh = manager.ensure_fresh(creds)
    if stored is None or fresh is not creds:
        store.save(service, fresh.to_token())
    return fresh
