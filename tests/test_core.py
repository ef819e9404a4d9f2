"""Core config/alerts tests (SURVEY S32/K6/R8, P12, F2)."""

from __future__ import annotations

import json

import pytest

from d2b_dataframework_spark.core.alerts import AlertLogger, alert_on_failure
from d2b_dataframework_spark.core.config import (
    TokenStore,
    extract_and_write_temp_credentials,
    load_schema_csv,
    schema_ddl,
)
from d2b_dataframework_spark.sources.connectors import serpapi
from d2b_dataframework_spark.sources.rest import FakeTransport


# config/alert plumbing — no ANSI-sensitive expressions
pytestmark = pytest.mark.single_leg

def test_schema_csv_spanish_headers_and_malformed_rows(tmp_path):
    p = tmp_path / "schema.csv"
    p.write_text(
        "nombre,tipo,descrip\n"
        "fecha,date,Día de la campaña\n"
        "\n"
        "solo_una_celda\n"
        "spend,float,Inversión\n"
        "sessions,integer,Sesiones\n",
        encoding="utf-8",
    )
    fields = load_schema_csv(str(p))
    assert [f.name for f in fields] == ["fecha", "spend", "sessions"]
    assert [f.type for f in fields] == ["DATE", "FLOAT", "INTEGER"]
    assert fields[0].description == "Dia de la campana"  # F2 ASCII fold
    assert schema_ddl(fields) == "`fecha` date, `spend` double, `sessions` bigint"


def test_schema_csv_absent_means_autodetect(tmp_path):
    assert load_schema_csv(str(tmp_path / "missing.csv")) is None


def test_credentials_lookup_and_validation(tmp_path):
    csv_path = tmp_path / "creds.csv"
    blob = json.dumps({"type": "service_account", "project_id": "p1"})
    csv_path.write_text(
        f'Nombre,project_id,JSON\nCliente Ñandú,p1,"{blob.replace(chr(34), chr(34)*2)}"\n',
        encoding="utf-8",
    )
    out = extract_and_write_temp_credentials(
        str(csv_path), "cliente nandu", "p1", out_dir=str(tmp_path)
    )
    assert json.load(open(out))["project_id"] == "p1"

    with pytest.raises(ValueError, match="project_id mismatch"):
        extract_and_write_temp_credentials(str(csv_path), "Cliente Ñandú", "other")
    with pytest.raises(ValueError, match="not found"):
        extract_and_write_temp_credentials(str(csv_path), "nadie", "p1")


def test_token_store_roundtrip(tmp_path):
    store = TokenStore(str(tmp_path / "tokens"))
    store.save("tiktok", {"access_token": "abc"})
    assert store.load("tiktok") == {"access_token": "abc"}
    assert store.load("missing") is None


def test_alert_logger_webhook_fire_and_swallow():
    t = FakeTransport()
    log = AlertLogger(webhook_url="hooks/alert", transport=t)
    log.critical("pipeline down")
    assert t.calls[-1] == ("hooks/alert", {"message": "pipeline down"})

    class BoomTransport(FakeTransport):
        def post(self, endpoint, body=None):
            raise RuntimeError("webhook down")

    log2 = AlertLogger(webhook_url="hooks/alert", transport=BoomTransport())
    log2.critical("still logged, no raise")  # must not raise


def test_alert_on_failure_decorator():
    t = FakeTransport()
    log = AlertLogger(webhook_url="hooks/alert", transport=t)

    @alert_on_failure(log, "nightly load")
    def boom():
        raise RuntimeError("stage failed")

    with pytest.raises(RuntimeError):
        boom()
    assert "nightly load failed" in t.calls[-1][1]["message"]


def test_serpapi_health_and_topn(spark):
    t = FakeTransport()
    t.responses[FakeTransport.key("account", {"api_key": "k"})] = {
        "plan_searches_left": 42, "this_month_usage": 8,
    }
    assert serpapi.check_api_key(t, "k")["plan_searches_left"] == 42

    results = spark.createDataFrame(
        [("https://www.rival.com/a",), ("https://rival.com/b",),
         ("https://client.com/x",), ("https://blog.other.io/p",)],
        "link string",
    )
    top = serpapi.top_competitor_domains(results, "client.com", top_n=2)
    rows = [(r["domain"], r["count"]) for r in top.collect()]
    assert rows == [("rival.com", 2), ("blog.other.io", 1)]


def test_top_level_api_facade_resolves_every_name():
    import d2b_dataframework_spark as pkg

    for name in pkg._API:
        assert callable(getattr(pkg, name)), name
    import pytest as _pytest

    with _pytest.raises(AttributeError):
        pkg.not_a_real_operator
    assert "pagerank" in dir(pkg)
