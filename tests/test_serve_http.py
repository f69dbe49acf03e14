"""HTTP serving endpoint: healthz + /v1/recommend end-to-end on localhost
(raw events → online featurization → jit-scored top-k)."""

import json
import threading
import urllib.request

import jax
import numpy as np
import pytest

from tlsan_tpu.core.config import ModelConfig
from tlsan_tpu.models.tlsan import TLSAN
from tlsan_tpu.serve.http import RecommendService, serve
from tlsan_tpu.serve.recommender import Recommender


@pytest.fixture(scope="module")
def server():
    rng = np.random.default_rng(0)
    users, items, cates = 20, 30, 5
    cfg = ModelConfig(model="tlsan", user_count=users, item_count=items,
                      cate_count=cates, Ls=10, Ts=8)
    cate_list = rng.integers(0, cates, items).astype(np.int32)
    params = TLSAN.init_params(jax.random.PRNGKey(0), cfg)
    rec = Recommender(TLSAN, params, cate_list, cfg, k=5, batch_size=8)
    service = RecommendService(rec, "tlsan", cfg, cate_list)
    service.start_worker_thread()  # CPU backend: worker thread is fine
    httpd = serve(service, port=0, host="127.0.0.1")  # ephemeral port
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=60) as r:
        return r.status, json.loads(r.read())


def test_healthz(server):
    with urllib.request.urlopen(f"{server}/healthz", timeout=30) as r:
        body = json.loads(r.read())
    assert r.status == 200
    assert body["status"] == "ok" and body["model"] == "tlsan"
    assert body["catalog_items"] == 30


def test_recommend_single_and_batch(server):
    events = [[1, 100], [2, 100], [7, 105], [9, 110], [4, 110]]
    status, body = _post(f"{server}/v1/recommend",
                         {"user": 3, "events": events})
    assert status == 200
    (res,) = body["results"]
    assert len(res["items"]) == 5 and len(res["scores"]) == 5
    assert all(0 <= i < 30 for i in res["items"])
    # scores sorted descending
    assert res["scores"] == sorted(res["scores"], reverse=True)

    status, body = _post(f"{server}/v1/recommend", {
        "requests": [{"user": 3, "events": events},
                     {"user": 4, "events": [[5, 50], [6, 60]]}],
        "k": 3})
    assert status == 200
    assert len(body["results"]) == 2
    assert all(len(r["items"]) == 3 for r in body["results"])
    # determinism: same request → same answer
    _, body2 = _post(f"{server}/v1/recommend",
                     {"user": 3, "events": events, "k": 3})
    assert body2["results"][0]["items"] == body["results"][0]["items"]


def test_bad_request_is_400(server):
    status = None
    try:
        _post(f"{server}/v1/recommend", {"user": 3, "events": []})
    except urllib.error.HTTPError as e:
        status = e.code
    assert status == 400


def test_empty_requests_list_is_400(server):
    """{"requests": []} must produce a clean 400, not a dropped socket
    (featurize_many raises ValueError before indexing rows[0])."""
    status = None
    try:
        _post(f"{server}/v1/recommend", {"requests": [], "k": 3})
    except urllib.error.HTTPError as e:
        status = e.code
    assert status == 400


def test_single_day_history_scores_finite(server):
    """All events on one day hits _split_sessions' single-session fallback
    (long-term history == the same-day session); the reciprocal time
    feature must clamp to the max-recency bucket instead of 1/0 = inf,
    so scores stay finite and strict-JSON parseable."""
    events = [[3, 100], [7, 100], [11, 100]]
    status, body = _post(f"{server}/v1/recommend",
                         {"user": 5, "events": events, "k": 5})
    assert status == 200
    (res,) = body["results"]
    assert all(np.isfinite(s) for s in res["scores"])
    assert res["scores"] == sorted(res["scores"], reverse=True)
