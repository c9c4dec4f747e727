"""
Built-in Kaldi binary ark/scp matrix IO: round trips, scp offsets, and the
pipeline steps that used to require kaldiio
(reference delegated all of this to the kaldiio package:
lidbox/features/__init__.py:113-118, lidbox/data/steps.py:1002-1074).
"""
import numpy as np
import pytest

from lidbox_tpu.data import steps as steps_mod
from lidbox_tpu.data.dataset import Dataset
from lidbox_tpu.features import kaldi_io, load_tensor_from_kaldi_archive


def _mats(n=4, seed=0):
    rng = np.random.default_rng(seed)
    return {f"utt{i:02d}": rng.normal(0, 1, (10 + 3 * i, 8)).astype(np.float32)
            for i in range(n)}


class TestRoundTrip:
    def test_ark_scp_round_trip(self, tmp_path):
        mats = _mats()
        spec = f"ark,scp:{tmp_path}/f.ark,{tmp_path}/f.scp"
        with kaldi_io.MatrixWriter(spec) as w:
            for k, m in mats.items():
                w(k, m)
        # via scp rxspecifiers
        entries = kaldi_io.read_scp(tmp_path / "f.scp")
        assert [k for k, _ in entries] == list(mats)
        for k, rx in entries:
            np.testing.assert_array_equal(kaldi_io.read_mat(rx), mats[k])
        # via ark iteration
        for k, m in kaldi_io.read_ark(tmp_path / "f.ark"):
            np.testing.assert_array_equal(m, mats[k])
        # lazy scp mapping
        lazy = kaldi_io.load_scp(tmp_path / "f.scp")
        np.testing.assert_array_equal(lazy["utt02"], mats["utt02"])

    def test_float64_and_feature_loader(self, tmp_path):
        m = np.arange(12, dtype=np.float64).reshape(3, 4)
        with kaldi_io.MatrixWriter(f"ark,scp:{tmp_path}/d.ark,"
                                   f"{tmp_path}/d.scp") as w:
            w("a", m)
        (key, rx), = kaldi_io.read_scp(tmp_path / "d.scp")
        assert kaldi_io.read_mat(rx).dtype == np.float64
        loaded = load_tensor_from_kaldi_archive(rx)
        assert loaded.dtype == np.float32
        np.testing.assert_array_equal(loaded, m.astype(np.float32))

    def test_single_entry_bare_path(self, tmp_path):
        m = np.ones((2, 5), np.float32)
        with kaldi_io.MatrixWriter(f"ark:{tmp_path}/one.ark") as w:
            w("x", m)
        np.testing.assert_array_equal(
            kaldi_io.read_mat(tmp_path / "one.ark"), m)

    def test_bare_path_with_colon_digits_name(self, tmp_path):
        # 'feats:2.ark' -> rpartition would see path='feats', offset='2';
        # a bare ark whose NAME ends in ':<digits>' must still open as a
        # plain path, not as an offset into a sibling file
        m = np.full((3, 4), 7.0, np.float32)
        with kaldi_io.MatrixWriter(f"ark:{tmp_path}/feats:2") as w:
            w("x", m)
        np.testing.assert_array_equal(
            kaldi_io.read_mat(tmp_path / "feats:2"), m)

    def test_lazy_scp_resolves_on_every_access_path(self, tmp_path):
        mats = _mats(3)
        with kaldi_io.MatrixWriter(f"ark,scp:{tmp_path}/l.ark,"
                                   f"{tmp_path}/l.scp") as w:
            for k, m in mats.items():
                w(k, m)
        lazy = kaldi_io.load_scp(tmp_path / "l.scp")
        assert len(lazy) == 3 and set(lazy) == set(mats)
        np.testing.assert_array_equal(lazy.get("utt01"), mats["utt01"])
        assert lazy.get("nope") is None
        for k, v in lazy.items():
            np.testing.assert_array_equal(v, mats[k])
        for v in lazy.values():
            assert isinstance(v, np.ndarray)
        assert "utt00" in lazy

    def test_rejects_garbage(self, tmp_path):
        p = tmp_path / "bad.ark"
        p.write_bytes(b"utt1 CMgarbage")
        with pytest.raises(ValueError):
            kaldi_io.read_mat(str(p) + ":5")


class TestPipelineSteps:
    def test_write_then_load_kaldi_steps(self, tmp_path):
        """write_to_kaldi_files -> scp -> load_kaldi_data reproduces the
        features with no kaldiio installed."""
        mats = _mats(3, seed=5)
        ds = Dataset.from_elements(
            [{"id": k, "input": m} for k, m in mats.items()])
        steps_mod.write_to_kaldi_files(ds, str(tmp_path))
        entries = kaldi_io.read_scp(tmp_path / "utt2feat.scp")
        assert [k for k, _ in entries] == list(mats)
        ds2 = Dataset.from_elements(
            [{"id": k, "kaldi_ark_key": rx} for k, rx in entries])
        out = steps_mod.load_kaldi_data(ds2, shape=[None, 8]).collect()
        for e in out:
            np.testing.assert_array_equal(e["input"], mats[e["id"]])
            assert "kaldi_ark_key" not in e
