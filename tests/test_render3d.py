"""TPU-native 3D renderer: analytic ground-truth pins.

A sphere volume has a closed-form silhouette and depth map under the
orthographic orbit camera, so volume rendering, isosurface ray-casting,
shading, and blob projection are all checked against geometry rather
than golden images (reference scene semantics: ``magmap/gui/vis_3d.py``
``mlab.volume`` / ``mlab.contour3d`` / ``mlab.points3d``).
"""

import functools

import numpy as np
import pytest

import jax.numpy as jnp

from magellanmapper_tpu.ops import render3d


SHAPE = (48, 48, 48)
R = 14.0


@pytest.fixture(scope="module")
def sphere_vol():
    zz, yy, xx = np.indices(SHAPE).astype(np.float32)
    c = (np.asarray(SHAPE, np.float32) - 1) / 2
    r = np.sqrt((zz - c[0]) ** 2 + (yy - c[1]) ** 2 + (xx - c[2]) ** 2)
    # smooth edge so gradients exist for shading
    return np.clip(1.0 - (r - R) / 3.0, 0.0, 1.0).astype(np.float32)


class TestVolumeRender:
    def test_silhouette_radius_and_center_brightness(self, sphere_vol):
        img = np.asarray(render3d.render_volume(
            jnp.asarray(sphere_vol), 30.0, 20.0, vmin=0.2, vmax=1.0,
            out_hw=(96, 96), n_steps=96, opacity=0.15))
        assert img.shape == (96, 96, 3)
        lum = img.mean(axis=-1)
        # center pixel integrates the longest chord -> brightest region
        assert lum[48, 48] > 0.3
        assert lum[48, 48] >= lum[48, 8]
        # silhouette: bright pixels confined to the projected disc
        # radius (orthographic: r_pix = r_vox * (H-1) / span)
        span = 2 * np.linalg.norm(SHAPE) / 2
        r_pix = (R + 3.0) * 95 / span
        ys, xs = np.nonzero(lum > 0.05)
        d = np.sqrt((ys - 47.5) ** 2 + (xs - 47.5) ** 2)
        assert d.max() <= r_pix + 2.0
        # rotation invariance of a sphere: a different azimuth renders
        # the same image to tolerance
        img2 = np.asarray(render3d.render_volume(
            jnp.asarray(sphere_vol), 120.0, -15.0, vmin=0.2, vmax=1.0,
            out_hw=(96, 96), n_steps=96, opacity=0.15))
        assert abs(img2.mean() - img.mean()) < 0.02

    def test_background_color_fills_misses(self, sphere_vol):
        img = np.asarray(render3d.render_volume(
            jnp.asarray(sphere_vol), 0.0, 0.0, vmin=0.2, vmax=1.0,
            out_hw=(64, 64), n_steps=64, opacity=0.2,
            bg=(0.0, 0.25, 0.5)))
        corner = img[1, 1]
        np.testing.assert_allclose(corner, [0.0, 0.25, 0.5], atol=1e-3)

    def test_shaded_mode_runs(self, sphere_vol):
        img = np.asarray(render3d.render_volume(
            jnp.asarray(sphere_vol), 40.0, 30.0, vmin=0.2, vmax=1.0,
            out_hw=(48, 48), n_steps=48, opacity=0.2, shaded=True))
        assert np.isfinite(img).all() and img.max() > 0.05


class TestIsosurface:
    def test_depth_matches_analytic_sphere(self, sphere_vol):
        rgb, depth = render3d.render_isosurface(
            jnp.asarray(sphere_vol), 0.5, 25.0, 15.0,
            out_hw=(96, 96), n_steps=192)
        rgb, depth = np.asarray(rgb), np.asarray(depth)
        hit = np.isfinite(depth)
        assert hit.any()
        # level 0.5 sits at r = R + 1.5; the camera starts each ray at
        # distance `radius` from the center, so the central pixel's
        # analytic depth is radius - (R + 1.5)
        radius = np.linalg.norm(SHAPE) / 2
        want = radius - (R + 1.5)
        assert abs(depth[48, 48] - want) < 1.0
        # depth increases toward the limb (sphere curves away)
        assert depth[48, 48] < depth[hit].max() - 2.0
        # facing the headlight, the center is lit brighter than the limb
        lum = rgb.mean(axis=-1)
        ys, xs = np.nonzero(hit)
        d = np.sqrt((ys - 47.5) ** 2 + (xs - 47.5) ** 2)
        limb = lum[ys[d > d.max() - 2], xs[d > d.max() - 2]].mean()
        assert lum[48, 48] > limb

    def test_light_direction_moves_highlight(self, sphere_vol):
        _, depth = render3d.render_isosurface(
            jnp.asarray(sphere_vol), 0.5, 0.0, 0.0, out_hw=(64, 64),
            n_steps=128)
        rgb_l, _ = render3d.render_isosurface(
            jnp.asarray(sphere_vol), 0.5, 0.0, 0.0, out_hw=(64, 64),
            n_steps=128, light_dir=(0.0, -1.0, -1.0))
        rgb_r, _ = render3d.render_isosurface(
            jnp.asarray(sphere_vol), 0.5, 0.0, 0.0, out_hw=(64, 64),
            n_steps=128, light_dir=(0.0, 1.0, -1.0))
        rgb_l, rgb_r = np.asarray(rgb_l), np.asarray(rgb_r)
        left = rgb_l[:, :28].mean()
        right_side = rgb_l[:, 36:].mean()
        # light from -y: the -y side of the sphere is brighter; and the
        # mirrored light flips the asymmetry
        hit = np.isfinite(np.asarray(depth))
        assert (rgb_l[:, :28].mean() - rgb_l[:, 36:].mean()) * \
            (rgb_r[:, :28].mean() - rgb_r[:, 36:].mean()) < 0

    def test_perspective_projection(self, sphere_vol):
        """Perspective rays diverge from an eye behind the film, so the
        sphere's silhouette shrinks vs orthographic by the tangent-cone
        factor df*Rs/sqrt(de^2 - Rs^2) (eye de=2.5R, film df=1.5R from
        the eye), while the central ray's depth is unchanged."""
        def silhouette(persp):
            rgb, depth = render3d.render_isosurface(
                jnp.asarray(sphere_vol), 0.5, 20.0, 10.0,
                out_hw=(96, 96), n_steps=192, perspective=persp)
            return np.isfinite(np.asarray(depth)), np.asarray(depth)
        hit_o, dep_o = silhouette(False)
        hit_p, dep_p = silhouette(True)
        big_r = np.linalg.norm(SHAPE) / 2
        rs = R + 1.5
        lin = (1.5 * big_r) * rs / np.sqrt((2.5 * big_r) ** 2 - rs ** 2)
        want = (lin / rs) ** 2
        ratio = hit_p.sum() / hit_o.sum()
        assert abs(ratio - want) < 0.08
        assert abs(dep_p[48, 48] - dep_o[48, 48]) < 1.0

    def test_miss_rays_are_background_and_inf(self, sphere_vol):
        rgb, depth = render3d.render_isosurface(
            jnp.asarray(sphere_vol), 0.5, 10.0, 10.0, out_hw=(64, 64),
            n_steps=64, bg=(0.1, 0.0, 0.0))
        rgb, depth = np.asarray(rgb), np.asarray(depth)
        assert np.isinf(depth[0, 0])
        np.testing.assert_allclose(rgb[0, 0], [0.1, 0.0, 0.0], atol=1e-4)


class TestShearWarp:
    """MXU shear-warp renders must match the gather ray-casters on the
    analytic sphere (one-bilinear-sample-per-slice quality trade ->
    loose tolerances, structural agreement)."""

    @pytest.mark.parametrize("azim,elev", [
        (30.0, 20.0), (120.0, -35.0), (80.0, 75.0), (200.0, 5.0)])
    def test_volume_matches_gather(self, sphere_vol, azim, elev):
        kw = dict(vmin=0.2, vmax=1.0, out_hw=(96, 96), opacity=0.15)
        ref = np.asarray(render3d.render_volume(
            jnp.asarray(sphere_vol), azim, elev, n_steps=96, **kw))
        got = np.asarray(render3d.render_volume_sw(
            jnp.asarray(sphere_vol), azim, elev, **kw))
        assert got.shape == ref.shape
        # same silhouette and brightness structure
        assert abs(got.mean() - ref.mean()) < 0.05
        m_ref = ref.mean(-1) > 0.05
        m_got = got.mean(-1) > 0.05
        iou = (m_ref & m_got).sum() / max((m_ref | m_got).sum(), 1)
        assert iou > 0.85

    def test_volume_background(self, sphere_vol):
        img = np.asarray(render3d.render_volume_sw(
            jnp.asarray(sphere_vol), 10.0, 10.0, vmin=0.2, vmax=1.0,
            out_hw=(64, 64), opacity=0.2, bg=(0.0, 0.25, 0.5)))
        np.testing.assert_allclose(img[1, 1], [0.0, 0.25, 0.5],
                                   atol=2e-2)

    @pytest.mark.parametrize("azim,elev", [
        (25.0, 15.0), (140.0, -40.0), (75.0, 70.0)])
    def test_isosurface_depth_matches_gather(self, sphere_vol, azim,
                                             elev):
        rgb_r, dep_r = render3d.render_isosurface(
            jnp.asarray(sphere_vol), 0.5, azim, elev, out_hw=(96, 96),
            n_steps=192)
        rgb_s, dep_s = render3d.render_isosurface_sw(
            jnp.asarray(sphere_vol), 0.5, azim, elev, out_hw=(96, 96))
        dep_r, dep_s = np.asarray(dep_r), np.asarray(dep_s)
        hit_r, hit_s = np.isfinite(dep_r), np.isfinite(dep_s)
        iou = (hit_r & hit_s).sum() / max((hit_r | hit_s).sum(), 1)
        assert iou > 0.85
        both = hit_r & hit_s
        # depth agrees to ~a voxel over the shared hit area
        err = np.abs(dep_r[both] - dep_s[both])
        assert np.median(err) < 1.5
        # shading agrees where both hit
        dl = np.abs(np.asarray(rgb_r)[both] - np.asarray(rgb_s)[both])
        assert np.median(dl) < 0.15

    def test_zoom_scales_silhouette_both_engines(self, sphere_vol):
        """zoom=2 doubles the projected radius identically in the
        gather and shear-warp paths (separate zoom plumbing)."""
        def area(fn, **kw):
            img = fn(jnp.asarray(sphere_vol), 25.0, 10.0, vmin=0.2,
                     vmax=1.0, out_hw=(96, 96), opacity=0.2, **kw)
            return (np.asarray(img).mean(-1) > 0.05).sum()
        a_ref1 = area(functools.partial(render3d.render_volume,
                                        n_steps=96))
        a_ref2 = area(functools.partial(render3d.render_volume,
                                        n_steps=96), zoom=2.0)
        a_sw1 = area(render3d.render_volume_sw)
        a_sw2 = area(render3d.render_volume_sw, zoom=2.0)
        assert 3.3 < a_ref2 / a_ref1 < 4.7   # ~4x area at 2x zoom
        assert 3.3 < a_sw2 / a_sw1 < 4.7
        assert abs(a_sw2 - a_ref2) < 0.15 * a_ref2

    def test_mip_mode(self, sphere_vol):
        """Arbitrary-angle MIP: center of the sphere projects the global
        max; MIP is everywhere >= the emission composite's luminance."""
        img = np.asarray(render3d.render_volume_sw(
            jnp.asarray(sphere_vol), 33.0, 21.0, vmin=0.0, vmax=1.0,
            out_hw=(96, 96), mode="mip"))
        lum = img.mean(axis=-1)
        assert lum.max() > 0.97  # sphere interior hits 1.0
        assert abs(lum[48, 48] - 1.0) < 0.03
        comp = np.asarray(render3d.render_volume_sw(
            jnp.asarray(sphere_vol), 33.0, 21.0, vmin=0.0, vmax=1.0,
            out_hw=(96, 96), opacity=0.02)).mean(axis=-1)
        assert (lum + 1e-3 >= comp * 0.9).mean() > 0.95

    def test_colormap_anchors(self, sphere_vol):
        """(K, 3) anchor colors evaluate a piecewise-linear transfer
        function: a pure-red->pure-blue ramp renders the dim sphere rim
        red-dominant and the bright interior blue-dominant; flat white
        anchors reproduce the single-color render exactly."""
        anchors = np.asarray([[1, 0, 0], [0, 0, 1]], np.float32)
        img = np.asarray(render3d.render_volume_sw(
            jnp.asarray(sphere_vol), 30.0, 20.0, vmin=0.0, vmax=1.0,
            out_hw=(96, 96), opacity=0.3, color=anchors))
        lum = img.sum(-1)
        ys, xs = np.nonzero(lum > 0.05)
        d = np.sqrt((ys - 47.5) ** 2 + (xs - 47.5) ** 2)
        rim = d > d.max() - 3
        assert img[..., 2][48, 48] > img[..., 0][48, 48]  # center blue
        assert (img[..., 0][ys[rim], xs[rim]].mean()
                > img[..., 2][ys[rim], xs[rim]].mean())   # rim red
        flat = np.asarray(render3d.render_volume_sw(
            jnp.asarray(sphere_vol), 30.0, 20.0, vmin=0.0, vmax=1.0,
            out_hw=(96, 96), opacity=0.3,
            color=np.ones((2, 3), np.float32)))
        plain = np.asarray(render3d.render_volume_sw(
            jnp.asarray(sphere_vol), 30.0, 20.0, vmin=0.0, vmax=1.0,
            out_hw=(96, 96), opacity=0.3))
        np.testing.assert_allclose(flat, plain, atol=1e-5)

    def test_center_depth_analytic(self, sphere_vol):
        _, dep = render3d.render_isosurface_sw(
            jnp.asarray(sphere_vol), 0.5, 25.0, 15.0, out_hw=(96, 96))
        dep = np.asarray(dep)
        radius = np.linalg.norm(SHAPE) / 2
        want = radius - (R + 1.5)
        assert abs(dep[48, 48] - want) < 1.5


class TestChannelComposite:
    def test_two_channels_blend_additively(self, sphere_vol):
        """Channel 0 (cyan) fills the left half, channel 1 (magenta)
        the right: the composite is cyan-ish left, magenta-ish right,
        and identical to the sum of the single-channel renders."""
        # split along axis 1 (y): at azim=0 the screen x axis is +-y,
        # so the halves land side by side instead of along the view ray
        left = sphere_vol.copy()
        left[:, 24:] = 0.0
        right = sphere_vol.copy()
        right[:, :24] = 0.0
        vol_c = np.stack([left, right], axis=-1)
        kw = dict(vmin=0.2, vmax=1.0, out_hw=(96, 96), opacity=0.3)
        comp = np.asarray(render3d.render_channels_sw(
            jnp.asarray(vol_c), 0.0, 0.0, **kw))
        a = np.asarray(render3d.render_volume_sw(
            jnp.asarray(left), 0.0, 0.0, color=(0.0, 1.0, 1.0), **kw))
        b = np.asarray(render3d.render_volume_sw(
            jnp.asarray(right), 0.0, 0.0, color=(1.0, 0.0, 1.0), **kw))
        np.testing.assert_allclose(comp, np.clip(a + b, 0, 1), atol=1e-5)
        # the channels occupy disjoint screen regions: pure-cyan pixels
        # (G, no R) and pure-magenta pixels (R, no G) both exist, and no
        # pixel mixes them
        cyan = (comp[..., 1] > 0.05) & (comp[..., 0] < 1e-3)
        magenta = (comp[..., 0] > 0.05) & (comp[..., 1] < 1e-3)
        mixed = (comp[..., 0] > 0.05) & (comp[..., 1] > 0.05)
        assert cyan.sum() > 50 and magenta.sum() > 50
        # a ~1-px seam along the split plane mixes by bilinear bleed
        assert mixed.sum() < 0.1 * (cyan.sum() + magenta.sum())

    def test_single_channel_and_bg(self, sphere_vol):
        img = np.asarray(render3d.render_channels_sw(
            jnp.asarray(sphere_vol), 15.0, 10.0, vmin=0.2, vmax=1.0,
            out_hw=(64, 64), opacity=0.25, bg=(0.1, 0.0, 0.2)))
        np.testing.assert_allclose(img[1, 1], [0.1, 0.0, 0.2], atol=0.02)


class TestBlobOverlay:
    def test_center_blob_projects_to_image_center(self, sphere_vol):
        _, depth = render3d.render_isosurface(
            jnp.asarray(sphere_vol), 0.5, 33.0, 12.0, out_hw=(64, 64),
            n_steps=96)
        c = (np.asarray(SHAPE, np.float32) - 1) / 2
        pts = render3d.render_blobs_overlay(
            depth, np.asarray([list(c) + [3.0]]), SHAPE, 33.0, 12.0,
            out_hw=(64, 64))
        assert pts.shape == (1, 4)
        assert abs(pts[0, 0] - 31.5) < 1.0 and abs(pts[0, 1] - 31.5) < 1.0
        # the center sits BEHIND the front surface -> occluded
        assert pts[0, 2] == 0.0
        # ray depth: the center lies half the bounding radius behind
        # the film plane's sphere entry
        assert pts[0, 3] == pytest.approx(
            float(np.linalg.norm(SHAPE)) / 2.0, rel=0.05)

    def test_front_blob_visible(self, sphere_vol):
        azim, elev = 0.0, 0.0
        _, depth = render3d.render_isosurface(
            jnp.asarray(sphere_vol), 0.5, azim, elev, out_hw=(64, 64),
            n_steps=96)
        view = np.asarray(render3d.camera_basis(azim, elev)[0])
        c = (np.asarray(SHAPE, np.float32) - 1) / 2
        front = c - view * (R + 4.0)  # just outside the surface
        pts = render3d.render_blobs_overlay(
            depth, front[None], SHAPE, azim, elev, out_hw=(64, 64))
        assert pts[0, 2] == 1.0


class TestShardedRender:
    """Film-row-sharded volume rendering over a device mesh."""

    @staticmethod
    def _mesh(n=4):
        import jax
        from jax.sharding import Mesh
        devs = np.asarray(jax.devices()[:n])
        return Mesh(devs, ("dp",))

    @staticmethod
    def _vol():
        z, y, x = np.ogrid[:24, :24, :24]
        vol = np.exp(-(((z - 12.0) ** 2 + (y - 12.0) ** 2
                        + (x - 12.0) ** 2) / 40.0)).astype(np.float32)
        return jnp.asarray(vol)

    def test_matches_single_device_ortho(self):
        vol = self._vol()
        mesh = self._mesh()
        kw = dict(vmin=0.0, vmax=1.0, out_hw=(64, 48), n_steps=48,
                  zoom=1.2, opacity=0.08, color=(0.9, 0.6, 0.2))
        ref = np.asarray(render3d.render_volume(
            vol, 30.0, 20.0, **kw))
        got = np.asarray(render3d.render_volume_sharded(
            vol, mesh, 30.0, 20.0, **kw))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=1e-6)
        assert ref.max() > 0.05   # scene is non-trivial

    def test_matches_single_device_perspective_shaded(self):
        vol = self._vol()
        mesh = self._mesh()
        kw = dict(out_hw=(64, 64), n_steps=40, perspective=True,
                  shaded=True, opacity=0.1, bg=(0.1, 0.0, 0.0))
        ref = np.asarray(render3d.render_volume(
            vol, -45.0, 55.0, **kw))
        got = np.asarray(render3d.render_volume_sharded(
            vol, mesh, -45.0, 55.0, **kw))
        np.testing.assert_allclose(got, ref, atol=1e-6)

    def test_indivisible_film_height_raises(self):
        with pytest.raises(ValueError, match="not divisible"):
            render3d.render_volume_sharded(
                self._vol(), self._mesh(), 0.0, 0.0, out_hw=(65, 64))

    def test_isosurface_matches_single_device_ortho(self):
        vol = self._vol()
        mesh = self._mesh()
        kw = dict(out_hw=(64, 48), n_steps=64, zoom=1.1,
                  color=(0.7, 0.8, 0.9), specular=0.5)
        rgb_ref, d_ref = render3d.render_isosurface(
            vol, 0.5, 30.0, 20.0, **kw)
        rgb, d = render3d.render_isosurface_sharded(
            vol, 0.5, mesh, 30.0, 20.0, **kw)
        np.testing.assert_allclose(
            np.asarray(rgb), np.asarray(rgb_ref), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(d), np.asarray(d_ref), rtol=1e-5, atol=1e-5)
        d_ref = np.asarray(d_ref)
        assert np.isfinite(d_ref).any() and np.isinf(d_ref).any()

    def test_isosurface_matches_single_device_perspective_lit(self):
        vol = self._vol()
        mesh = self._mesh()
        kw = dict(out_hw=(64, 64), n_steps=48, perspective=True,
                  light_dir=(-1.0, 0.5, 0.25), bg=(0.05, 0.0, 0.1))
        rgb_ref, d_ref = render3d.render_isosurface(
            vol, 0.4, -45.0, 55.0, **kw)
        rgb, d = render3d.render_isosurface_sharded(
            vol, 0.4, mesh, -45.0, 55.0, **kw)
        np.testing.assert_allclose(
            np.asarray(rgb), np.asarray(rgb_ref), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(d), np.asarray(d_ref), rtol=1e-5, atol=1e-5)

    def test_isosurface_indivisible_film_height_raises(self):
        with pytest.raises(ValueError, match="not divisible"):
            render3d.render_isosurface_sharded(
                self._vol(), 0.5, self._mesh(), 0.0, 0.0,
                out_hw=(65, 64))
