"""sqlite DB + transformer tests."""

import numpy as np
import pytest

from magellanmapper_tpu.atlas import transformer
from magellanmapper_tpu.io import np_io, sqlite


class TestDB:
    def test_roundtrip_blobs(self, tmp_path):
        db = sqlite.load_db(str(tmp_path / "test.db"))
        exp_id = db.select_or_insert_experiment("exp1")
        roi_id, status = db.select_or_insert_roi(
            exp_id, 0, (10, 20, 30), (64, 64, 16))
        assert status == "inserted"
        blobs = np.array([
            [5.0, 6, 7, 3.0, 1, -1, 0],
            [8.0, 9, 10, 2.5, -1, -1, 1]])
        db.insert_blobs(roi_id, blobs)
        back = db.select_blobs_by_roi(roi_id)
        assert back.shape == (2, 10)
        got = back[np.lexsort((back[:, 2], back[:, 1], back[:, 0]))]
        np.testing.assert_allclose(got[0, :4], [5, 6, 7, 3.0])
        np.testing.assert_allclose(got[0, 7:10], [5, 6, 7])
        # ROI is unique per offset
        roi_id2, status2 = db.select_or_insert_roi(
            exp_id, 0, (10, 20, 30), (64, 64, 16))
        assert roi_id2 == roi_id and status2 == "exists"
        db.close()

    def test_schema_matches_reference(self, tmp_path):
        db = sqlite.load_db(str(tmp_path / "schema.db"))
        db.cur.execute(
            "SELECT name FROM sqlite_master WHERE type='table'")
        tables = {r["name"] for r in db.cur.fetchall()}
        assert {"about", "experiments", "rois", "blobs",
                "blob_matches"} <= tables
        db.cur.execute("SELECT version FROM about")
        assert db.cur.fetchone()["version"] == sqlite.DB_VERSION
        db.close()

    def test_blob_matches(self, tmp_path):
        db = sqlite.load_db(str(tmp_path / "m.db"))
        exp_id = db.select_or_insert_experiment("e")
        roi_id, _ = db.select_or_insert_roi(exp_id, 0, (0, 0, 0), (9, 9, 9))
        blobs = np.array([[1.0, 2, 3, 2, -1, -1, 0],
                          [4.0, 5, 6, 2, -1, -1, 1]])
        db.insert_blobs(roi_id, blobs)
        db.insert_blob_matches(
            roi_id, [(blobs[0], blobs[1], 1.5)])
        matches = db.select_blob_matches(roi_id)
        assert len(matches) == 1
        assert matches[0][2] == 1.5
        db.close()

    def test_merge_truth_dbs(self, tmp_path):
        paths = []
        for i in range(2):
            db = sqlite.load_db(str(tmp_path / f"t{i}.db"))
            exp = db.select_or_insert_experiment(f"exp{i}")
            roi, _ = db.select_or_insert_roi(exp, 0, (0, 0, i), (5, 5, 5))
            db.insert_blobs(roi, np.array([[1.0, 1, 1, 2, 1, 1, 0]]))
            db.close()
            paths.append(str(tmp_path / f"t{i}.db"))
        merged = sqlite.merge_truth_dbs(paths, str(tmp_path / "merged.db"))
        rois = merged.get_rois()
        assert len(rois) == 2
        merged.close()


class TestTransformer:
    def test_transpose_path(self):
        assert transformer.get_transposed_image_path(
            "/d/brain.npy", scale=0.5) == "/d/brain_scale0.5.npy"

    def test_rescale_whole_image(self, tmp_path, rng):
        arr = rng.random((1, 16, 32, 32)).astype(np.float32)
        base = str(tmp_path / "vol.npy")
        np_io.write_npy(base, arr, resolutions=[[2.0, 1.0, 1.0]])
        out_path = transformer.transpose_img(base, rescale=0.5, chunk_z=7)
        out5d = np_io.read_file(out_path)
        assert out5d.img.shape == (1, 8, 16, 16)
        # resolutions doubled by 0.5x downsample
        np.testing.assert_allclose(out5d.resolutions[0], [4.0, 2.0, 2.0])
        # chunked result matches one-shot resize
        import jax.numpy as jnp
        from magellanmapper_tpu.ops import resize as resize_ops
        ref = np.asarray(resize_ops.resize(
            jnp.asarray(arr[0]), (8, 16, 16)))
        np.testing.assert_allclose(np.asarray(out5d.img[0]), ref, atol=1e-5)

    def test_plane_transpose(self, tmp_path, rng):
        arr = rng.random((1, 8, 16, 24)).astype(np.float32)
        base = str(tmp_path / "p.npy")
        np_io.write_npy(base, arr)
        out_path = transformer.transpose_img(base, plane="xz")
        out5d = np_io.read_file(out_path)
        assert out5d.img.shape == (1, 16, 8, 24)

    def test_preprocess_img(self, rng):
        vol = rng.random((1, 8, 16, 16)).astype(np.float32)
        out = transformer.preprocess_img(vol, ["saturate", "rotate90"])
        assert out.shape[0] == 1


class TestShardedResize:
    """Transpose-style sharded resize must match the single-device op."""

    @staticmethod
    def _mesh(n=8):
        import jax
        from jax.sharding import Mesh
        return Mesh(np.asarray(jax.devices()[:n]), ("sp",))

    def test_parity_linear_odd_sizes(self):
        import jax.numpy as jnp
        from magellanmapper_tpu.ops import resize as resize_ops
        rng = np.random.default_rng(11)
        # odd extents: neither input nor output divisible by 8 devices
        vol = jnp.asarray(rng.random((13, 21, 17)).astype(np.float32))
        out_shape = (9, 30, 11)
        ref = np.asarray(resize_ops.resize(vol, out_shape))
        got = np.asarray(resize_ops.resize_sharded(
            vol, out_shape, self._mesh()))
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_output_stays_distributed(self):
        # with a z extent divisible by the mesh, the result must come
        # back z-sharded (ready for slab streaming), not gathered
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P
        from magellanmapper_tpu.ops import resize as resize_ops
        mesh = self._mesh()
        vol = jnp.zeros((13, 21, 17), jnp.float32)
        out = resize_ops.resize_sharded(vol, (16, 30, 11), mesh)
        want = NamedSharding(mesh, P("sp", None, None))
        assert out.sharding.is_equivalent_to(want, out.ndim), \
            out.sharding

    def test_parity_nearest_labels_multichannel(self):
        import jax.numpy as jnp
        from magellanmapper_tpu.ops import resize as resize_ops
        rng = np.random.default_rng(12)
        labels = jnp.asarray(
            rng.integers(0, 9, (10, 12, 14, 2)).astype(np.int32))
        out_shape = (20, 6, 28)
        ref = np.asarray(resize_ops.resize(labels, out_shape, order=0))
        got = np.asarray(resize_ops.resize_sharded(
            labels, out_shape, self._mesh(), order=0))
        np.testing.assert_array_equal(got, ref)
        assert got.dtype == np.int32

    def test_transpose_img_with_mesh(self, tmp_path, rng):
        arr = rng.random((1, 16, 32, 32)).astype(np.float32)
        base = str(tmp_path / "vol_mesh.npy")
        np_io.write_npy(base, arr, resolutions=[[2.0, 1.0, 1.0]])
        out_path = transformer.transpose_img(
            base, rescale=0.5, mesh=self._mesh())
        out5d = np_io.read_file(out_path)
        assert out5d.img.shape == (1, 8, 16, 16)
        import jax.numpy as jnp
        from magellanmapper_tpu.ops import resize as resize_ops
        ref = np.asarray(resize_ops.resize(
            jnp.asarray(arr[0]), (8, 16, 16)))
        np.testing.assert_allclose(
            np.asarray(out5d.img[0]), ref, atol=1e-5)
