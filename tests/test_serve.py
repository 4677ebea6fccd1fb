"""Serving endpoint (quanonet_tpu/serve.py): bucketed recompile-free
predictions, HTTP round-trip, input validation."""
import json
import os
import threading
import urllib.request

import numpy as np
import pytest

from quanonet_tpu.infer import load_model, predict
from quanonet_tpu.serve import Predictor, _buckets, make_server

CKPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    'pretrained_weights/Antideriv/'
    'Antideriv_QuanONet_Net5-1-5-1_Q2_TF_S0.001_1000x100_Seed0/'
    'best_model.npz')
needs_ckpt = pytest.mark.skipif(not os.path.exists(CKPT),
                                reason="pretrained checkpoint missing")


def test_bucket_ladder():
    assert _buckets(8) == [1, 2, 4, 8]
    assert _buckets(100) == [1, 2, 4, 8, 16, 32, 64, 100]
    assert _buckets(1) == [1]


@pytest.fixture(scope='module')
def served():
    if not os.path.exists(CKPT):
        pytest.skip("pretrained checkpoint missing")
    return Predictor(CKPT, branch_in=10, trunk_in=1, max_batch=16)


@needs_ckpt
def test_predictor_matches_infer_predict(served):
    rng = np.random.RandomState(0)
    b = rng.randn(7, 10).astype(np.float32)     # 7 -> bucket 8 (padded)
    t = rng.rand(7, 1).astype(np.float32)
    got = served.predict(b, t)
    model, params, cfg = load_model(CKPT, branch_in=10, trunk_in=1)
    want = predict(model, params, b, t, cfg=cfg)
    assert got.shape == want.shape == (7, 1)
    np.testing.assert_allclose(got, want, atol=1e-5)


@needs_ckpt
def test_predictor_bucket_padding_is_inert(served):
    """Padded rows must not change the real rows' outputs: the same row
    through different bucket sizes gives the same prediction."""
    rng = np.random.RandomState(1)
    b = rng.randn(3, 10).astype(np.float32)     # bucket 4
    t = rng.rand(3, 1).astype(np.float32)
    small = served.predict(b, t)
    big = served.predict(np.tile(b, (5, 1)),    # 15 rows -> bucket 16
                         np.tile(t, (5, 1)))
    np.testing.assert_allclose(big[:3], small, atol=1e-5)


@needs_ckpt
def test_predictor_spans_multiple_chunks(served):
    rng = np.random.RandomState(2)
    n = 35                                       # > max_batch=16: 3 chunks
    b = rng.randn(n, 10).astype(np.float32)
    t = rng.rand(n, 1).astype(np.float32)
    out = served.predict(b, t)
    assert out.shape == (n, 1)
    one = served.predict(b[20:21], t[20:21])
    np.testing.assert_allclose(out[20:21], one, atol=1e-5)


@needs_ckpt
def test_predictor_input_validation(served):
    with pytest.raises(ValueError, match="branch must be"):
        served.predict(np.zeros((4, 3), np.float32))
    with pytest.raises(ValueError, match="trunk must be"):
        served.predict(np.zeros((4, 10), np.float32),
                       np.zeros((3, 1), np.float32))
    # a REQUIRED trunk must never be silently zero-filled
    with pytest.raises(ValueError, match="expects a trunk"):
        served.predict(np.zeros((4, 10), np.float32))


@needs_ckpt
def test_http_round_trip(served):
    srv = make_server(served, host='127.0.0.1', port=0)
    port = srv.server_port
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        def call(path, payload=None):
            url = f'http://127.0.0.1:{port}{path}'
            if payload is None:
                req = urllib.request.Request(url)
            else:
                req = urllib.request.Request(
                    url, data=json.dumps(payload).encode(),
                    headers={'Content-Type': 'application/json'})
            try:
                with urllib.request.urlopen(req, timeout=120) as r:
                    return r.status, json.loads(r.read())
            except urllib.error.HTTPError as e:
                return e.code, json.loads(e.read())

        code, health = call('/healthz')
        assert code == 200 and health == {"ok": True}

        rng = np.random.RandomState(3)
        b = rng.randn(5, 10).astype(np.float32)
        t = rng.rand(5, 1).astype(np.float32)
        code, resp = call('/predict', {"branch": b.tolist(),
                                       "trunk": t.tolist()})
        assert code == 200 and resp['n'] == 5
        assert resp['buckets'] == [8]      # 5 rows pad to the 8-bucket
        want = served.predict(b, t)
        np.testing.assert_allclose(np.asarray(resp['pred']), want,
                                   atol=1e-5)

        # multi-chunk request (n > max_batch=16): one bucket per chunk
        b2 = rng.randn(21, 10).astype(np.float32)
        t2 = rng.rand(21, 1).astype(np.float32)
        code, resp = call('/predict', {"branch": b2.tolist(),
                                       "trunk": t2.tolist()})
        assert code == 200 and resp['buckets'] == [16, 8]

        code, info = call('/info')
        assert code == 200 and info['branch_in'] == 10
        assert info['requests'] >= 1

        code, err = call('/predict', {"branch": [[1.0, 2.0]]})
        assert code == 400 and 'branch must be' in err['error']

        code, err = call('/nope')
        assert code == 404
    finally:
        srv.shutdown()
        thread.join(timeout=10)


@needs_ckpt
def test_buckets_for(served):
    assert served.buckets_for(5) == [8]
    assert served.buckets_for(16) == [16]
    assert served.buckets_for(17) == [16, 1]
    assert served.buckets_for(40) == [16, 16, 8]
    assert served.buckets_for(0) == [1]


@needs_ckpt
def test_http_body_size_cap(served):
    """POST bodies over the cap are rejected with 413 before being read
    (ADVICE r3: unauthenticated endpoint must not be memory-exhaustible)."""
    srv = make_server(served, host='127.0.0.1', port=0, max_body_bytes=1024)
    port = srv.server_port
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        big = {"branch": [[1.0] * 10] * 100, "trunk": [[0.5]] * 100}
        req = urllib.request.Request(
            f'http://127.0.0.1:{port}/predict',
            data=json.dumps(big).encode(),
            headers={'Content-Type': 'application/json'})
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req, timeout=60)
        assert exc.value.code == 413
        assert 'cap' in json.loads(exc.value.read())['error']
        # a small request still works on the same server
        small = {"branch": [[1.0] * 10], "trunk": [[0.5]]}
        req = urllib.request.Request(
            f'http://127.0.0.1:{port}/predict',
            data=json.dumps(small).encode(),
            headers={'Content-Type': 'application/json'})
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.status == 200
    finally:
        srv.shutdown()
        thread.join(timeout=10)
