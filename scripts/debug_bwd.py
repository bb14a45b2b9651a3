"""Debug: compare pallas(interpret) vs xla blend-level pair grads."""
import sys
sys.path.insert(0, ".")
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from deblurgs_tpu.ops.rasterize import RasterizeConfig, render
from deblurgs_tpu.ops import tile_blend, binning as binning_lib, preprocess as pre_lib, pallas_blend
from deblurgs_tpu.core.transforms import build_covariance
from tests.scene_factory import make_camera, make_gaussians

cam, cs, _ = make_camera(width=48, height=32)
means, scales, rots, opac, shs = make_gaussians(jax.random.PRNGKey(21), n=150, sh_deg=1, opacity_max=0.95)
bg = jnp.array([0.2, 0.4, 0.6])

w_img = jax.random.normal(jax.random.PRNGKey(3), (32, 48, 3))
w_depth = jax.random.normal(jax.random.PRNGKey(4), (32, 48)) * 0.01

XLA_CFG = RasterizeConfig(backend="xla", max_pairs=1 << 14, k_max=512)
PL_CFG = RasterizeConfig(backend="pallas", max_pairs=1 << 14, interpret=True)

# blend-level grads directly: build pre+binning once
cov6 = build_covariance(scales, rots, 1.0)
pre = pre_lib.preprocess(means, cov6, shs, None, opac, cam, cs, sh_degree=1,
                         tile_w=16, tile_h=16)
bcfg_x = XLA_CFG.blend_config(cs)
bcfg_p = PL_CFG.blend_config(cs)
bins = binning_lib.bin_gaussians(pre, tiles_x=bcfg_x.tiles_x, tiles_y=bcfg_x.tiles_y, max_pairs=1 << 14)


def blend_loss(cfg, m2d, conic, o, col, dep):
    img, dimg, fT, ncon = tile_blend.blend(cfg, bins.pair_gauss, bins.pair_tile,
                                           bins.tile_start, bins.tile_stop,
                                           m2d, conic, o, col, dep, bg)
    return jnp.sum(img * w_img) + jnp.sum(dimg * w_depth)

args = (pre.means2d, pre.conic, pre.opacity, pre.color, pre.depth)
gx = jax.grad(lambda *a: blend_loss(bcfg_x, *a), argnums=(0, 1, 2, 3, 4))(*args)
gp = jax.grad(lambda *a: blend_loss(bcfg_p, *a), argnums=(0, 1, 2, 3, 4))(*args)

names = ["means2d", "conic", "opacity", "color", "depth"]
for n, a, b in zip(names, gp, gx):
    a, b = np.asarray(a), np.asarray(b)
    d = np.abs(a - b)
    scale = np.abs(b).max() + 1e-8
    bad = np.argwhere(d / scale > 5e-5)
    print(f"{n:8s} maxrel={d.max()/scale:.2e} nbad={len(bad)}")
    if len(bad):
        idx = np.unique(bad[:, 0])[:10]
        print("   bad gaussians:", idx)
        for i in idx[:5]:
            print(f"   g{i}: pl={a[i]} xla={b[i]}")

# which tiles do those gaussians live in?
pg = np.asarray(bins.pair_gauss)
pt = np.asarray(bins.pair_tile)
cnt = np.asarray(bins.tile_stop - bins.tile_start)
print("tile counts:", cnt)
bad_set = set()
for n, a, b in zip(names, gp, gx):
    a, b = np.asarray(a), np.asarray(b)
    scale = np.abs(b).max() + 1e-8
    bb = np.argwhere(np.abs(a - b) / scale > 5e-5)
    bad_set |= set(bb[:, 0].tolist())
for g in sorted(bad_set):
    tiles = pt[pg == g]
    print(f"gaussian {g}: tiles {tiles}, slots {np.nonzero(pg == g)[0]}")

# full-render grads (as in the failing test)
import functools

def loss(cfg, means_, scales_, rots_, opac_, shs_, cam_):
    out = render(means_, scales_, rots_, opac_, shs_, cam_, cs, bg, cfg=cfg, sh_degree=1)
    return jnp.sum(out.image * w_img) + jnp.sum(out.depth * w_depth)

fargs = (means, scales, rots, opac, shs, cam)
g_pl = jax.grad(functools.partial(loss, PL_CFG), argnums=(0, 1, 2, 3, 4, 5))(*fargs)
g_xla = jax.grad(functools.partial(loss, XLA_CFG), argnums=(0, 1, 2, 3, 4, 5))(*fargs)
for name, a, b in zip(["means", "scales", "rots", "opac", "shs", "cam"], g_pl, g_xla):
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        la, lb = np.asarray(la), np.asarray(lb)
        scale = np.abs(lb).max() + 1e-8
        d = np.abs(la - lb) / scale
        bad = np.argwhere(d > 5e-5)
        print(f"{name:8s} maxrel={d.max():.2e} nbad={len(bad)}")
        if len(bad):
            for i in np.unique(bad[:, 0])[:5]:
                print(f"   idx{i}: pl={la[i]} xla={lb[i]}")
