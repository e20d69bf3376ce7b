"""ConfigProxy access tracking, deep_merge, ConfigGenerator heuristics."""

import pytest

from nanowakeword_tpu.config.generator import ConfigGenerator, clamp
from nanowakeword_tpu.config.proxy import ConfigProxy, deep_merge


class TestConfigProxy:
    def test_tracks_leaf_access(self):
        proxy = ConfigProxy({"a": 1, "nested": {"b": 2, "c": 3}})
        _ = proxy["a"]
        _ = proxy["nested"]["b"]
        report = proxy.report()
        assert report == {"a": 1, "nested.b": 2}

    def test_tracks_defaulted_get(self):
        proxy = ConfigProxy({})
        assert proxy.get("missing", 42) == 42
        assert proxy.report() == {"missing": 42}

    def test_missing_key_raises_with_path(self):
        proxy = ConfigProxy({"nested": {}})
        with pytest.raises(KeyError, match="nested.x"):
            _ = proxy["nested"]["x"]

    def test_nested_default_dict_proxies(self):
        proxy = ConfigProxy({})
        sub = proxy.get("block", {"k": 5})
        assert sub["k"] == 5
        assert proxy.report()["block.k"] == 5

    def test_numeric_coercion(self):
        proxy = ConfigProxy({"lr": "0.001", "steps": 100})
        assert float(proxy.get("lr")) == pytest.approx(0.001)
        assert 1 + proxy["steps"] == 101
        assert proxy["steps"] + 1 == 101

    def test_to_dict_roundtrip(self):
        data = {"a": 1, "n": {"b": [1, 2]}}
        assert ConfigProxy(data).to_dict() == data

    def test_setitem_tracks(self):
        proxy = ConfigProxy({})
        proxy["total_length"] = 32000
        assert proxy.report()["total_length"] == 32000

    def test_dict_proxy_not_coercible(self):
        proxy = ConfigProxy({"n": {"a": 1}})
        with pytest.raises(TypeError):
            int(proxy["n"])


class TestDeepMerge:
    def test_nested_merge(self):
        d1 = {"a": 1, "n": {"x": 1, "y": 2}}
        d2 = {"n": {"y": 3, "z": 4}, "b": 5}
        out = deep_merge(d1, d2)
        assert out == {"a": 1, "n": {"x": 1, "y": 3, "z": 4}, "b": 5}

    def test_scalar_overwrites_dict(self):
        assert deep_merge({"n": {"x": 1}}, {"n": 7}) == {"n": 7}


class TestConfigGenerator:
    def test_hardware_only_keys(self):
        cfg = ConfigGenerator().generate()
        assert cfg["steps"] == 10000  # clamped to min with no data stats
        assert cfg["augmentation_batch_size"] in (16, 32, 64, 128)
        assert cfg["feature_batch_size"] > 0
        assert 0.4 <= cfg["dropout_prob"] <= 0.8
        assert cfg["clr_step_size_up"] > 0

    def test_scales_with_data(self):
        small = ConfigGenerator({"H_pos": 0.1, "H_neg": 0.2}).generate()
        big = ConfigGenerator({"H_pos": 5.0, "H_neg": 15.0}).generate()
        assert big["steps"] >= small["steps"]
        assert big["layer_size"] >= small["layer_size"]
        assert 10000 <= big["steps"] <= 40000

    def test_duplication_rates_balance_sources(self):
        cfg = ConfigGenerator({
            "H_noise_paths": {"a": 10.0, "b": 2.0, "c": 0.0}
        }).generate()
        rates = cfg["background_paths_duplication_rate"]
        assert rates == [1, 5, 1]

    def test_clamp(self):
        assert clamp(5, 0, 10) == 5
        assert clamp(-1, 0, 10) == 0
        assert clamp(99, 0, 10) == 10
