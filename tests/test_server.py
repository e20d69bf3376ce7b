"""RemoteVerifier server: live loopback round-trips over the wire protocol."""

import asyncio
import json
import socket
import struct
import threading
import time

import numpy as np
import pytest

websockets = pytest.importorskip("websockets")

from nanowakeword_tpu.interpreter.remote_verifier import (  # noqa: E402
    encode_audio, encode_features, serve)
from nanowakeword_tpu.interpreter.server_security import (  # noqa: E402
    SecurityConfig, encode_token_request)


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    from nanowakeword_tpu.export.artifact import save_nww
    from nanowakeword_tpu.models.model import Model
    root = tmp_path_factory.mktemp("srv")
    cfg = {"activation_function": "relu", "embedding_dim": 16}
    model = Model(config=cfg, model_name="srv", input_shape=(16, 96),
                  model_type="dnn", layer_dim=16, n_blocks=1)
    path = str(root / "srv.nww")
    save_nww(path, model=model, config=cfg, model_name="srv")
    return path


def _start_server(artifact, pipeline, security=None):
    port = _free_port()
    ready = threading.Event()

    def run():
        try:
            serve(model_path=artifact, pipeline=pipeline, host="127.0.0.1",
                  port=port, log_level="ERROR", security=security,
                  _ready_callback=lambda srv: ready.set())
        except Exception:  # noqa: BLE001
            pass

    t = threading.Thread(target=run, daemon=True)
    t.start()
    assert ready.wait(timeout=60), "server did not start"
    return port


async def _roundtrip(port, message, headers=None):
    async with websockets.connect(f"ws://127.0.0.1:{port}",
                                  additional_headers=headers) as ws:
        await ws.send(message)
        return json.loads(await asyncio.wait_for(ws.recv(), timeout=30))


@pytest.fixture(scope="module")
def feature_server(artifact):
    return _start_server(artifact, "verifier_only")


class TestVerifierOnly:
    def test_feature_scoring(self, feature_server):
        feats = np.random.default_rng(0).normal(
            size=(1, 16, 96)).astype(np.float32)
        resp = asyncio.run(_roundtrip(feature_server,
                                      encode_features(feats)))
        assert 0.0 <= resp["score"] <= 1.0

    def test_deterministic_scores(self, feature_server):
        feats = np.ones((1, 16, 96), np.float32)
        r1 = asyncio.run(_roundtrip(feature_server, encode_features(feats)))
        r2 = asyncio.run(_roundtrip(feature_server, encode_features(feats)))
        assert r1["score"] == pytest.approx(r2["score"], abs=1e-6)

    def test_audio_tag_ignored_in_verifier_mode(self, feature_server):
        audio = np.zeros(1280, np.int16)
        resp = asyncio.run(_roundtrip(feature_server, encode_audio(audio)))
        assert resp["score"] == 0.0


class TestFullPipeline:
    def test_raw_audio_streaming(self, artifact):
        port = _start_server(artifact, "full")

        async def stream():
            rng = np.random.default_rng(1)
            async with websockets.connect(f"ws://127.0.0.1:{port}") as ws:
                scores = []
                for _ in range(25):
                    chunk = rng.integers(-8000, 8000, 1280,
                                         dtype=np.int64).astype(np.int16)
                    await ws.send(encode_audio(chunk))
                    resp = json.loads(await asyncio.wait_for(ws.recv(),
                                                             timeout=30))
                    scores.append(resp["score"])
                return scores

        scores = asyncio.run(stream())
        assert len(scores) == 25
        # warm-up returns 0.0 until 16 feature frames exist, then real scores
        assert any(s > 0.0 for s in scores[16:])


class TestSecuredServer:
    def test_api_key_and_token_flow(self, artifact):
        security = SecurityConfig(api_keys=["sekrit"], enable_tokens=True)
        port = _start_server(artifact, "verifier_only", security=security)
        feats = np.zeros((1, 16, 96), np.float32)

        # no key -> closed at handshake
        with pytest.raises(Exception):
            asyncio.run(_roundtrip(port, encode_features(feats)))

        # valid key -> scored
        resp = asyncio.run(_roundtrip(port, encode_features(feats),
                                      headers={"X-API-Key": "sekrit"}))
        assert "score" in resp

        # exchange key for a token, then connect with the token
        async def token_flow():
            async with websockets.connect(
                    f"ws://127.0.0.1:{port}",
                    additional_headers={"X-API-Key": "sekrit"}) as ws:
                await ws.send(encode_token_request("sekrit"))
                token = json.loads(await ws.recv())["token"]
            return await _roundtrip(port, encode_features(feats),
                                    headers={"X-Token": token})

        resp = asyncio.run(token_flow())
        assert "score" in resp


class TestRemoteSession:
    def test_session_roundtrip_and_reconnect_interface(self, artifact):
        from nanowakeword_tpu.interpreter.remote_verifier import \
            _RemoteSession
        port = _start_server(artifact, "verifier_only")
        session = _RemoteSession(uri=f"ws://127.0.0.1:{port}",
                                 model_name="srv", timeout=30.0)
        feats = np.zeros((16, 96), np.float32)
        score, carry = session.run(feats)
        assert 0.0 <= score <= 1.0 and carry is None
        assert session.feature_length == 16

        # onnxruntime-InferenceSession parity: the reference's direct-user
        # convention run(None, {"input": feats}) -> [array([[[score]]])]
        # (reference remote_verifier.py:576-618)
        out = session.run(None, {"input": feats})
        assert isinstance(out, list) and out[0].shape == (1, 1, 1)
        assert abs(float(out[0].reshape(())) - score) < 1e-6
        out2 = session.run({"input": feats})
        assert out2[0].shape == (1, 1, 1)
        inp = session.get_inputs()[0]
        assert inp.name == "input" and inp.shape[-1] == 96
        session.close()


class TestDynamicBatching:
    def test_concurrent_clients_all_scored(self, artifact):
        """Many concurrent clients: the batcher coalesces requests and every
        client gets its own correct score back."""
        port = _start_server(artifact, "verifier_only")
        rng = np.random.default_rng(5)
        feats = [rng.normal(size=(1, 16, 96)).astype(np.float32)
                 for _ in range(12)]

        async def one(f):
            async with websockets.connect(f"ws://127.0.0.1:{port}") as ws:
                scores = []
                for _ in range(4):
                    await ws.send(encode_features(f))
                    resp = json.loads(await asyncio.wait_for(ws.recv(),
                                                             timeout=30))
                    scores.append(resp["score"])
                return scores

        async def many():
            return await asyncio.gather(*[one(f) for f in feats])

        results = asyncio.run(many())
        assert len(results) == 12
        for scores in results:
            # same features -> same score on every round trip (up to the
            # last-ulp noise of scoring at different padded batch sizes)
            assert max(scores) - min(scores) < 1e-4
            assert 0.0 <= scores[0] <= 1.0
        # distinct features -> (almost surely) distinct scores
        firsts = [round(r[0], 8) for r in results]
        assert len(set(firsts)) > 6


class TestDataParallelServing:
    def test_sharded_run_batch_matches_single_device(self, artifact):
        """The mesh-sharded batched forward must reproduce the single-device
        scores exactly (it is the same program, partitioned), including the
        pad-to-data-axis-multiple path (batch 13 on an 8-way mesh)."""
        import jax
        from nanowakeword_tpu.export.artifact import load_nww
        from nanowakeword_tpu.interpreter.nanointerpreter import _LocalSession
        from nanowakeword_tpu.parallel.mesh import make_mesh

        header, model, _ = load_nww(artifact)
        plain = _LocalSession(model, header)
        sharded = _LocalSession(model, header,
                                mesh=make_mesh(len(jax.devices())))
        feats = np.random.default_rng(3).normal(
            size=(13, 16, 96)).astype(np.float32)
        p0 = plain.run_batch(feats)
        p1 = sharded.run_batch(feats)
        assert p1.shape == (13,)
        np.testing.assert_allclose(p1, p0, atol=1e-6)

    def test_server_with_data_parallel(self, artifact):
        """End-to-end: a server sharding over the 8-device virtual mesh
        serves concurrent clients with correct per-client scores."""
        port = _free_port()
        ready = threading.Event()

        def run():
            try:
                serve(model_path=artifact, pipeline="verifier_only",
                      host="127.0.0.1", port=port, log_level="ERROR",
                      data_parallel=-1, batch_wait_ms=10.0,
                      _ready_callback=lambda srv: ready.set())
            except Exception:  # noqa: BLE001
                pass

        threading.Thread(target=run, daemon=True).start()
        assert ready.wait(timeout=60)

        rng = np.random.default_rng(7)
        feats = [rng.normal(size=(1, 16, 96)).astype(np.float32)
                 for _ in range(10)]

        async def one(f):
            async with websockets.connect(f"ws://127.0.0.1:{port}") as ws:
                await ws.send(encode_features(f))
                resp = json.loads(await asyncio.wait_for(ws.recv(),
                                                         timeout=30))
                return resp["score"]

        async def many():
            return await asyncio.gather(*[one(f) for f in feats])

        scores = asyncio.run(many())
        assert len(scores) == 10
        # scores must match an unsharded local session per client
        from nanowakeword_tpu.export.artifact import load_nww
        from nanowakeword_tpu.interpreter.nanointerpreter import _LocalSession
        header, model, _ = load_nww(artifact)
        plain = _LocalSession(model, header)
        expected = plain.run_batch(np.concatenate(feats, axis=0))
        np.testing.assert_allclose(scores, expected, atol=1e-5)


class TestBatchingDisabled:
    def test_serve_without_batching(self, artifact):
        """--no-batching path: every request scored individually."""
        port = _free_port()
        ready = threading.Event()

        def run():
            try:
                serve(model_path=artifact, pipeline="verifier_only",
                      host="127.0.0.1", port=port, log_level="ERROR",
                      batching=False,
                      _ready_callback=lambda srv: ready.set())
            except Exception:  # noqa: BLE001
                pass

        threading.Thread(target=run, daemon=True).start()
        assert ready.wait(timeout=60)
        feats = np.ones((1, 16, 96), np.float32)
        r1 = asyncio.run(_roundtrip(port, encode_features(feats)))
        r2 = asyncio.run(_roundtrip(port, encode_features(feats)))
        assert r1["score"] == pytest.approx(r2["score"], abs=1e-6)


class TestOnnxServing:
    def test_serve_onnx_model(self, tmp_path):
        """The server hosts exported .onnx graphs directly (reference
        remote_verifier.py:223-230 parity): same wire protocol, same score
        as the .nww artifact of the same weights."""
        from nanowakeword_tpu.export.artifact import save_nww
        from nanowakeword_tpu.export.onnx_export import export_onnx
        from nanowakeword_tpu.models.model import Model
        cfg = {"activation_function": "relu", "embedding_dim": 16}
        model = Model(config=cfg, model_name="osrv", input_shape=(16, 96),
                      model_type="dnn", layer_dim=16, n_blocks=1)
        onnx_path = export_onnx(model, str(tmp_path / "osrv.onnx"))
        nww_path = str(tmp_path / "osrv.nww")
        save_nww(nww_path, model=model, config=cfg, model_name="osrv")

        feats = np.random.default_rng(9).normal(
            size=(1, 16, 96)).astype(np.float32)
        port_o = _start_server(onnx_path, "verifier_only")
        s_o = asyncio.run(_roundtrip(port_o, encode_features(feats)))["score"]
        port_n = _start_server(nww_path, "verifier_only")
        s_n = asyncio.run(_roundtrip(port_n, encode_features(feats)))["score"]
        assert 0.0 <= s_o <= 1.0
        assert abs(s_o - s_n) < 1e-4
