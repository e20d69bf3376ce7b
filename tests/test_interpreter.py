"""Interpreter: DetectionResult, cascade, warm-up, patience/debounce, VAD."""

import numpy as np
import pytest

from nanowakeword_tpu.interpreter.nanointerpreter import (DetectionResult,
                                                          NanoInterpreter)
from nanowakeword_tpu.interpreter.vad import VAD


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    """Train-free artifact: a tiny DNN exported straight after init."""
    root = tmp_path_factory.mktemp("models")
    from nanowakeword_tpu.export.artifact import save_nww
    from nanowakeword_tpu.models.model import Model

    cfg = {"activation_function": "relu", "embedding_dim": 16}
    model = Model(config=cfg, model_name="toy", input_shape=(16, 96),
                  model_type="dnn", layer_dim=16, n_blocks=1)
    path = str(root / "toy.nww")
    save_nww(path, model=model, config=cfg, model_name="toy")

    lite = Model(config=cfg, model_name="toy_lite", input_shape=(16, 96),
                 model_type="dnn", layer_dim=8, n_blocks=1)
    save_nww(str(root / "toy_lite.nww"), model=lite, config=cfg,
             model_name="toy_lite")
    return path


class TestDetectionResult:
    def test_accessors(self):
        r = DetectionResult({"m": 0.9, "g": 0.4}, model_name="m",
                            gate_name="g", threshold=0.5)
        assert r.score == 0.9
        assert r.gate_score == 0.4
        assert r.detected
        assert r["m"] == 0.9
        assert r.get("missing", -1.0) == -1.0
        assert "m" in r and "x" not in r
        assert "score=0.9" in repr(r)

    def test_no_threshold_never_detected(self):
        r = DetectionResult({"m": 0.99}, "m", None)
        assert not r.detected


class TestLoadModel:
    def test_single_model(self, artifact):
        interp = NanoInterpreter.load_model(artifact)
        assert interp.model_name == "toy"
        assert not interp.is_cascade
        assert interp.model_feature_length["toy"] == 16

    def test_cascade_autodiscovery(self, artifact):
        interp = NanoInterpreter.load_model(artifact, cascade=True)
        assert interp.is_cascade
        assert interp.gate_name == "toy_lite"
        assert interp.cascade_config["verifier"] == "toy"
        assert list(interp.models) == ["toy_lite", "toy"]

    def test_missing_file_raises(self):
        with pytest.raises(FileNotFoundError):
            NanoInterpreter.load_model("/nonexistent/model.nww")

    def test_info_surface(self, artifact):
        interp = NanoInterpreter.load_model(artifact, cascade=True)
        info = interp.info
        assert info["model_name"] == "toy"
        assert info["is_cascade"] and not info["is_remote"]
        assert set(info["loaded_models"]) == {"toy", "toy_lite"}


class TestPredict:
    def test_warmup_zeroes_first_five(self, artifact):
        interp = NanoInterpreter.load_model(artifact)
        rng = np.random.default_rng(0)
        scores = []
        # feed 30 chunks; buffer needs 16 frames before real scores appear,
        # then the first 5 predictions are zeroed
        for _ in range(30):
            r = interp.predict(rng.integers(-8000, 8000, 1280,
                                            dtype=np.int64).astype(np.int16))
            scores.append(r.score)
        assert all(s == 0.0 for s in scores[:21]) or scores[0] == 0.0
        assert any(s != 0.0 for s in scores)  # eventually scores flow

    def test_short_chunk_accumulates(self, artifact):
        interp = NanoInterpreter.load_model(artifact)
        r = interp.predict(np.zeros(100, np.int16))
        assert isinstance(r, DetectionResult)

    def test_reset(self, artifact):
        interp = NanoInterpreter.load_model(artifact)
        interp.predict(np.zeros(1280 * 20, np.int16))
        interp.reset()
        assert interp.preprocessor.feature_buffer.shape[0] == 0
        assert all(v == 0.0 for v in interp.post_processed_scores.values())

    def test_patience_requires_threshold(self, artifact):
        interp = NanoInterpreter.load_model(artifact)
        with pytest.raises(ValueError):
            interp.predict(np.zeros(1280, np.int16), patience={"toy": 3})

    def test_patience_and_debounce_exclusive(self, artifact):
        interp = NanoInterpreter.load_model(artifact)
        with pytest.raises(ValueError):
            interp.predict(np.zeros(1280, np.int16), patience={"toy": 3},
                           threshold={"toy": 0.5}, debounce_time=1.0)

    def test_predict_clip_chunking(self, artifact):
        interp = NanoInterpreter.load_model(artifact)
        results = interp.predict_clip(np.zeros(1280 * 7 + 100, np.int16))
        assert len(results) == 8


class TestCascadeGating:
    def test_gate_below_threshold_skips_verifier(self, artifact):
        interp = NanoInterpreter.load_model(artifact, cascade=True,
                                            gate_threshold=1.1)  # never fires
        rng = np.random.default_rng(1)
        for _ in range(25):
            r = interp.predict(rng.integers(-8000, 8000, 1280,
                                            dtype=np.int64).astype(np.int16))
        # verifier never runs -> its score stays 0 even after warm-up
        assert r.scores["toy"] == 0.0

    def test_general_path_saves_verifier_compute(self, artifact):
        """The cascade's reason to exist: on the general (session-loop)
        path, a below-gate chunk must not invoke the verifier session at
        all (reference `nanointerpreter.py:665-674`). Counted, not
        inferred from scores."""
        interp = NanoInterpreter.load_model(artifact, cascade=True,
                                            gate_threshold=1.1)
        interp._fused_step = None        # force the general path
        verifier = interp.models["toy"]
        calls = {"n": 0}
        original = verifier.run

        def counting_run(*a, **k):
            calls["n"] += 1
            return original(*a, **k)
        verifier.run = counting_run
        rng = np.random.default_rng(2)
        for _ in range(25):
            interp.predict(rng.integers(-8000, 8000, 1280,
                                        dtype=np.int64).astype(np.int16))
        assert calls["n"] == 0, "verifier session ran despite closed gate"

        # open the gate: verifier sessions start running
        interp.cascade_config["gate_threshold"] = -1.0
        for _ in range(5):
            interp.predict(rng.integers(-8000, 8000, 1280,
                                        dtype=np.int64).astype(np.int16))
        assert calls["n"] == 5


class TestVAD:
    def test_speech_scores_higher_than_silence(self):
        vad = VAD()
        rng = np.random.default_rng(0)
        t = np.arange(16000) / 16000
        # speech-band modulated tone after a silence lead-in for the floor
        silence = rng.normal(0, 30, 16000)
        speech = (9000 * np.sin(2 * np.pi * 700 * t)
                  * (0.6 + 0.4 * np.sin(2 * np.pi * 4 * t)))
        for i in range(0, 16000, 1280):
            vad.predict(silence[i:i + 1280])
        sil_score = np.mean(list(vad.prediction_buffer)[-5:])
        for i in range(0, 16000, 1280):
            vad.predict(speech[i:i + 1280])
        sp_score = np.mean(list(vad.prediction_buffer)[-5:])
        assert sp_score > sil_score + 0.2

    def test_buffer_cap(self):
        vad = VAD()
        for _ in range(200):
            vad.predict(np.zeros(1280))
        assert len(vad.prediction_buffer) == 125


class TestStatefulStreaming:
    def test_streaming_gru_carries_state(self, tmp_path):
        from nanowakeword_tpu.export.artifact import save_nww
        from nanowakeword_tpu.models.model import Model
        cfg = {"activation_function": "relu", "embedding_dim": 16}
        m = Model(config=cfg, model_name="sgru", input_shape=(1, 96),
                  model_type="streaming_gru", layer_dim=16, n_blocks=1,
                  dropout_prob=0.0)
        assert m.stateful
        path = str(tmp_path / "sgru.nww")
        save_nww(path, model=m, config=cfg, model_name="sgru")

        interp = NanoInterpreter.load_model(path)
        assert interp.is_stateful["sgru"]
        rng = np.random.default_rng(3)
        for _ in range(8):
            interp.predict(rng.integers(-8000, 8000, 1280,
                                        dtype=np.int64).astype(np.int16))
        carry1 = interp.hidden_states["sgru"]
        assert carry1 is not None
        interp.predict(rng.integers(-8000, 8000, 1280,
                                    dtype=np.int64).astype(np.int16))
        carry2 = interp.hidden_states["sgru"]
        assert not np.allclose(np.asarray(carry1[0]), np.asarray(carry2[0]))
        interp.reset()
        assert interp.hidden_states["sgru"] is None


class TestListenLoop:
    """Drives the real listen() capture->ring->predict loop with a fake
    pyaudio module (round-2 weak #8: these paths had no executed test —
    no audio device exists in CI, so the mic is simulated)."""

    def test_listen_detects_scores_and_stops(self, artifact, monkeypatch):
        import sys
        import threading  # noqa: F401  (listen uses it internally)
        import time
        import types

        served = {"n": 0}

        class FakeStream:
            def read(self, n, exception_on_overflow=False):
                served["n"] += 1
                time.sleep(0.002)  # pace like a (fast) microphone
                rng = np.random.default_rng(served["n"])
                return (rng.normal(0, 0.05, n) * 32767).astype(
                    np.int16).tobytes()

            def stop_stream(self):
                pass

            def close(self):
                pass

        class FakePyAudio:
            def open(self, **kwargs):
                assert kwargs["rate"] == 16000 and kwargs["channels"] == 1
                return FakeStream()

            def terminate(self):
                pass

        fake = types.ModuleType("pyaudio")
        fake.paInt16 = 8
        fake.PyAudio = FakePyAudio
        monkeypatch.setitem(sys.modules, "pyaudio", fake)

        interp = NanoInterpreter.load_model(artifact)
        detections, scores, chunks = [], [], []
        interp.listen(
            on_detection=lambda name, s: detections.append(
                (name, s, time.monotonic())),
            threshold=-1.0,      # every scored chunk clears the bar
            cooldown=0.2,
            blocking=False,
            on_score=lambda v, g: scores.append(v),
            on_audio=lambda a: chunks.append(a))
        deadline = time.time() + 60
        while len(detections) < 2 and time.time() < deadline:
            time.sleep(0.05)
        interp.stop()
        assert interp._listen_thread is None  # stop() joined and cleared

        assert detections, "listen() never fired a detection"
        assert detections[0][0] == "toy"
        assert scores and chunks
        assert all(c.dtype == np.int16 and len(c) == 1280
                   for c in chunks[:3])
        if len(detections) >= 2:   # cooldown enforced between firings
            assert detections[1][2] - detections[0][2] >= 0.2 * 0.9
        # the mic kept being read the whole time
        assert served["n"] >= len(chunks)


class TestNoiseReduction:
    """_reduce_noise plumbing with a fake noisereduce module (round-2 weak
    #8: noisereduce is absent in CI, so the import-time gate is patched)."""

    def _fake(self, monkeypatch, fn):
        import types
        import nanowakeword_tpu.interpreter.nanointerpreter as ni
        monkeypatch.setattr(ni, "NOISEREDUCE_AVAILABLE", True)
        # `nr` is unbound when the real package is absent -> raising=False
        monkeypatch.setattr(ni, "nr",
                            types.SimpleNamespace(reduce_noise=fn),
                            raising=False)
        return ni

    def test_applied_on_predict_when_enabled(self, artifact, monkeypatch):
        calls = {"n": 0}

        def halve(y, sr, stationary=True):
            assert sr == 16000
            calls["n"] += 1
            return y * 0.5

        self._fake(monkeypatch, halve)
        interp = NanoInterpreter.load_model(artifact,
                                            enable_noise_reduction=True)
        assert interp.noise_reducer_enabled
        x = (np.random.default_rng(0).normal(0, 0.05, 1280)
             * 32767).astype(np.int16)
        out = interp._reduce_noise(x)
        assert calls["n"] == 1
        np.testing.assert_allclose(
            out, (x.astype(np.float32) * 0.5).astype(np.int16), atol=1)
        interp.predict(x)
        assert calls["n"] == 2, "predict() skipped the noise reducer"

    def test_failure_returns_original_audio(self, artifact, monkeypatch):
        def boom(y, sr, stationary=True):
            raise RuntimeError("synthetic failure")

        self._fake(monkeypatch, boom)
        interp = NanoInterpreter.load_model(artifact,
                                            enable_noise_reduction=True)
        x = (np.random.default_rng(1).normal(0, 0.05, 1280)
             * 32767).astype(np.int16)
        np.testing.assert_array_equal(interp._reduce_noise(x), x)

    def test_disabled_when_package_missing(self, artifact, monkeypatch):
        import nanowakeword_tpu.interpreter.nanointerpreter as ni
        monkeypatch.setattr(ni, "NOISEREDUCE_AVAILABLE", False)
        interp = NanoInterpreter.load_model(artifact,
                                            enable_noise_reduction=True)
        assert not interp.noise_reducer_enabled
