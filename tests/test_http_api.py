"""HTTP serving surface: routing, auth, caching, row caps, error shapes.

Mirrors the reference's FastAPI contract (api.py:151-400) — token
handshake, endpoint payloads, 401/404/422 behavior — via a live
ThreadingHTTPServer on an ephemeral port.
"""

import json
import urllib.error
import urllib.parse
import urllib.request

import pytest

from healthcare_data_warehouse_spark.plans.http_api import ApiServer, TokenAuthority
from healthcare_data_warehouse_spark.plans.serving import QueryService

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def api(spark):
    server = ApiServer(QueryService(spark, SF_DIR), users={"admin": "s3cret"})
    port = server.serve()
    yield f"http://127.0.0.1:{port}", server
    server.shutdown()


def _call(url, method="GET", token=None, body=None, content_type=None):
    req = urllib.request.Request(url, method=method)
    if token:
        req.add_header("Authorization", f"Bearer {token}")
    data = None
    if body is not None:
        data = body if isinstance(body, bytes) else json.dumps(body).encode()
        req.add_header("Content-Type", content_type or "application/json")
    try:
        with urllib.request.urlopen(req, data=data) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _token(base):
    status, payload = _call(f"{base}/auth/token", "POST",
                            body={"username": "admin", "password": "s3cret"})
    assert status == 200 and payload["token_type"] == "bearer"
    return payload["access_token"]


def test_root_and_health_open(api):
    base, _ = api
    status, payload = _call(f"{base}/")
    assert status == 200 and "/health" in payload["routes"]
    status, payload = _call(f"{base}/health")
    assert status == 200 and payload["status"] == "healthy"


def test_auth_rejects_bad_password_and_bad_token(api):
    base, _ = api
    status, _ = _call(f"{base}/auth/token", "POST",
                      body={"username": "admin", "password": "wrong"})
    assert status == 401
    status, payload = _call(f"{base}/analytics/kpis")
    assert status == 401 and "credentials" in payload["detail"]
    status, _ = _call(f"{base}/analytics/kpis", token="not.a.token")
    assert status == 401


def test_oauth2_form_encoding_accepted(api):
    base, _ = api
    form = urllib.parse.urlencode({"username": "admin", "password": "s3cret"}).encode()
    status, payload = _call(f"{base}/auth/token", "POST", body=form,
                            content_type="application/x-www-form-urlencoded")
    assert status == 200 and "access_token" in payload


def test_kpis_single_row_payload(api):
    base, _ = api
    status, rows = _call(f"{base}/analytics/kpis", token=_token(base))
    assert status == 200 and len(rows) == 1
    assert set(rows[0]) == {"total_patients", "total_providers",
                            "total_visits", "avg_cost"}
    assert rows[0]["total_visits"] > 0


def test_diagnoses_limit_param_maps_to_k(api):
    base, _ = api
    status, rows = _call(f"{base}/analytics/diagnoses?limit=2", token=_token(base))
    assert status == 200 and len(rows) == 2


def test_patient_visits_and_404(api):
    base, _ = api
    token = _token(base)
    status, rows = _call(f"{base}/patients/1/visits", token=token)
    assert status == 200 and len(rows) >= 1
    status, payload = _call(f"{base}/patients/999999999/visits", token=token)
    assert status == 404 and "not found" in payload["detail"].lower()
    # Injection-shaped path parameter → typed-coercion 422, not a query.
    status, _ = _call(f"{base}/patients/1%20OR%201=1/visits", token=token)
    assert status == 422


def test_generic_query_route_and_unknown_query(api):
    base, _ = api
    token = _token(base)
    status, rows = _call(f"{base}/query/agg_global_kpis", token=token)
    assert status == 200 and len(rows) == 1
    status, _ = _call(f"{base}/query/no_such_query", token=token)
    assert status == 404
    # Unknown parameter on a real query → 422 (ParamSpec rejection).
    status, _ = _call(f"{base}/query/agg_global_kpis?bogus=1", token=token)
    assert status == 422


def test_row_cap_enforced(api):
    base, server = api
    server.max_rows = 7
    try:
        status, rows = _call(f"{base}/query/project_filter?limit=100000",
                             token=_token(base))
        assert status == 200 and len(rows) == 7
    finally:
        server.max_rows = 1000


def test_cache_hit_on_repeat(api):
    base, server = api
    token = _token(base)
    server.cache.clear()
    before = server.cache.hits
    for _ in range(2):
        status, _ = _call(f"{base}/analytics/age-groups", token=token)
        assert status == 200
    assert server.cache.hits == before + 1
    _call(f"{base}/cache/clear", "POST", token=token)
    status, _ = _call(f"{base}/analytics/age-groups", token=token)
    assert status == 200 and server.cache.hits == before + 1


def test_token_expiry_claim_checked():
    auth = TokenAuthority({"u": "p"})
    tok = auth.issue("u", "p")
    assert auth.verify(tok) == "u"
    # Forge an expired token with the wrong key → both paths rejected.
    other = TokenAuthority({"u": "p"})
    assert other.verify(tok) is None


def test_cache_lru_entry_bound():
    from healthcare_data_warehouse_spark.plans.http_api import _ResultCache

    c = _ResultCache(ttl=300, max_entries=16)
    # 10k distinct param combinations must hold the cache at the cap.
    for i in range(10_000):
        c.put(f"k{i}", [{"v": i}])
    assert len(c._data) == 16
    # The 16 most recent survive; everything older was evicted.
    assert c.get("k9999") == [{"v": 9999}]
    assert c.get("k9984") == [{"v": 9984}]
    assert c.get("k0") is None
    # get() refreshes recency: touch k9984, insert one, k9984 survives
    # while the least-recently-used (k9985) is the one evicted.
    c.get("k9984")
    c.put("new", [{"v": -1}])
    assert c.get("k9984") is not None
    assert c.get("k9985") is None


def test_cache_expired_entries_dropped_on_get():
    from healthcare_data_warehouse_spark.plans.http_api import _ResultCache

    c = _ResultCache(ttl=-1, max_entries=4)  # already expired on insert
    c.put("a", [1])
    assert c.get("a") is None
    assert "a" not in c._data  # expired entry can't pin an LRU slot
