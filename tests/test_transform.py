"""Feature generation: autotune, job processing, raw path, skip/overwrite."""

import numpy as np
import pytest

from nanowakeword_tpu.config.proxy import ConfigProxy
from nanowakeword_tpu.data.transform_clips import (determine_clip_length,
                                                   transform_clips)
from nanowakeword_tpu.utils.audio_io import write_wav


@pytest.fixture
def audio_dirs(tmp_path):
    rng = np.random.default_rng(0)
    pos = tmp_path / "pos"
    noise = tmp_path / "noise"
    pos.mkdir()
    noise.mkdir()
    for i in range(4):
        n = rng.integers(20000, 28000)
        write_wav(str(pos / f"p{i}.wav"), rng.normal(0, 4000, n))
    write_wav(str(noise / "n0.wav"), rng.normal(0, 1500, 48000))
    return pos, noise


class TestClipLength:
    def test_fixed_length_wins(self):
        cfg = ConfigProxy({"clip_length_samples": 24000})
        assert determine_clip_length(cfg) == 24000

    def test_autotune_snaps_to_minimum(self, audio_dirs):
        pos, _ = audio_dirs
        cfg = ConfigProxy({"positive_data_path": str(pos)})
        # median ~24k + 750ms buffer ~= 36k -> above min but within snap?
        out = determine_clip_length(cfg)
        assert out >= 32000
        assert out % 1 == 0

    def test_autotune_disabled_uses_fallback(self):
        cfg = ConfigProxy({"audio_processing": {
            "autotune_length": {"enabled": False,
                                "min_allowable_length": 48000}}})
        assert determine_clip_length(cfg) == 48000


class _Args:
    transform_clips = True
    overwrite = False


class TestJobs:
    def _config(self, pos, noise, out_dir, rounds=2, aug=True):
        cfg = {
            "transform_clips": True,
            "clip_length_samples": 32000,
            "augmentation_batch_size": 4,
            "num_workers": 0,
            "background_paths": [str(noise)] if aug else [],
            "rir_paths": [],
            "feature_generation_manifest": {
                "job": {
                    "input_audio_dirs": [str(pos)],
                    "output_filename": "feats.npy",
                    "use_background_noise": aug,
                    "augmentation_rounds": rounds,
                    **({} if aug else {"augmentation_settings": False}),
                },
            },
        }
        return ConfigProxy(cfg)

    def test_augmented_job_shapes(self, audio_dirs, tmp_path):
        pos, noise = audio_dirs
        out = tmp_path / "features"
        out.mkdir()
        transform_clips(self._config(pos, noise, out), _Args(), str(out))
        feats = np.load(out / "feats.npy")
        assert feats.shape[0] == 8          # 4 clips x 2 rounds
        assert feats.shape[1:] == (16, 96)  # 32000 samples -> 16 frames
        assert np.abs(feats).sum() > 0

    def test_skip_existing_and_overwrite(self, audio_dirs, tmp_path):
        pos, noise = audio_dirs
        out = tmp_path / "features"
        out.mkdir()
        cfg = self._config(pos, noise, out, rounds=1)
        transform_clips(cfg, _Args(), str(out))
        mtime = (out / "feats.npy").stat().st_mtime_ns
        # second run skips
        transform_clips(self._config(pos, noise, out, rounds=1), _Args(),
                        str(out))
        assert (out / "feats.npy").stat().st_mtime_ns == mtime

        class Over(_Args):
            overwrite = True

        transform_clips(self._config(pos, noise, out, rounds=1), Over(),
                        str(out))
        assert (out / "feats.npy").stat().st_mtime_ns != mtime

    def test_raw_path_without_augmentation(self, audio_dirs, tmp_path):
        pos, noise = audio_dirs
        out = tmp_path / "features"
        out.mkdir()
        transform_clips(self._config(pos, noise, out, rounds=1, aug=False),
                        _Args(), str(out))
        feats = np.load(out / "feats.npy")
        assert feats.shape == (4, 16, 96)
