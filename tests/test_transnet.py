"""TransNetV2 JAX shot-boundary model: component parity vs torch
primitives + full-model contract."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from frameino_tpu.preprocess import transnet as TN


def test_banded_lookup_matches_naive():
    rs = np.random.RandomState(0)
    sim = rs.randn(2, 7, 7).astype(np.float32)
    window = 5
    band = np.asarray(TN._banded_lookup(jnp.asarray(sim), window))
    half = (window - 1) // 2
    for b in range(2):
        for t in range(7):
            for w in range(window):
                j = t - half + w
                expect = sim[b, t, j] if 0 <= j < 7 else 0.0
                assert abs(band[b, t, w] - expect) < 1e-6


def test_color_histograms_match_numpy():
    rs = np.random.RandomState(1)
    frames = rs.randint(0, 256, (1, 3, 8, 9, 3)).astype(np.uint8)
    got = np.asarray(TN.color_histograms(jnp.asarray(frames)))
    for t in range(3):
        f = frames[0, t].reshape(-1, 3).astype(np.int64)
        bins = ((f[:, 0] >> 5) << 6) + ((f[:, 1] >> 5) << 3) + (f[:, 2] >> 5)
        hist = np.bincount(bins, minlength=512).astype(np.float32)
        hist /= np.linalg.norm(hist)
        np.testing.assert_allclose(got[0, t], hist, atol=1e-5)


def test_sep_conv_matches_torch():
    """(1,3,3)+(3,1,1)-dilated separable conv == torch Conv3d pair under
    the state-dict layout conversion."""
    rs = np.random.RandomState(2)
    cin, f, d = 3, 4, 2
    c1 = torch.nn.Conv3d(cin, 2 * f, (1, 3, 3), padding=(0, 1, 1),
                         bias=False)
    c2 = torch.nn.Conv3d(2 * f, f, (3, 1, 1), dilation=(d, 1, 1),
                         padding=(d, 0, 0), bias=True)
    x = torch.tensor(rs.randn(1, cin, 6, 9, 10).astype(np.float32))
    with torch.no_grad():
        ref = c2(c1(x)).numpy()

    sd = {"c.layers.0.weight": c1.weight.detach().numpy(),
          "c.layers.1.weight": c2.weight.detach().numpy(),
          "c.layers.1.bias": c2.bias.detach().numpy()}
    p = {"spatial": {"kernel": np.ascontiguousarray(
            sd["c.layers.0.weight"].transpose(2, 3, 4, 1, 0))},
         "temporal": {"kernel": np.ascontiguousarray(
             sd["c.layers.1.weight"].transpose(2, 3, 4, 1, 0)),
             "bias": sd["c.layers.1.bias"]}}
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1))  # NCTHW->NTHWC
    got = np.asarray(TN._sep_conv(jax.tree.map(jnp.asarray, p), xj, d))
    np.testing.assert_allclose(got.transpose(0, 4, 1, 2, 3), ref,
                               rtol=1e-4, atol=1e-4)


def test_batch_norm_matches_torch():
    rs = np.random.RandomState(3)
    C = 8
    bn = torch.nn.BatchNorm3d(C, eps=1e-3).eval()
    with torch.no_grad():
        bn.weight.copy_(torch.tensor(rs.rand(C).astype(np.float32) + 0.5))
        bn.bias.copy_(torch.tensor(rs.randn(C).astype(np.float32)))
        bn.running_mean.copy_(torch.tensor(rs.randn(C).astype(np.float32)))
        bn.running_var.copy_(torch.tensor(
            rs.rand(C).astype(np.float32) + 0.5))
    x = torch.tensor(rs.randn(1, C, 2, 3, 4).astype(np.float32))
    with torch.no_grad():
        ref = bn(x).numpy()
    p = {"weight": jnp.asarray(bn.weight.detach().numpy()),
         "bias": jnp.asarray(bn.bias.detach().numpy()),
         "mean": jnp.asarray(bn.running_mean.detach().numpy()),
         "var": jnp.asarray(bn.running_var.detach().numpy())}
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1))
    got = np.asarray(TN._batch_norm(p, xj, 1e-3))
    np.testing.assert_allclose(got.transpose(0, 4, 1, 2, 3), ref,
                               rtol=1e-5, atol=1e-5)


def test_full_model_contract():
    cfg = TN.TRANSNETV2
    params = TN.init_transnet(jax.random.key(0), cfg)
    frames = (np.random.RandomState(4).randint(
        0, 256, (1, 12, 27, 48, 3))).astype(np.uint8)
    one_hot, many_hot = TN.transnet_forward(cfg, params,
                                            jnp.asarray(frames))
    assert one_hot.shape == (1, 12, 1)
    assert many_hot.shape == (1, 12, 1)
    assert np.isfinite(np.asarray(one_hot)).all()


def test_state_dict_loader_and_scorer():
    """Torch-named synthetic state dict loads; the scorer plugs into
    scene_cut.score_scene_cuts."""
    cfg = TN.TRANSNETV2
    ref_params = TN.init_transnet(jax.random.key(1), cfg)
    rs = np.random.RandomState(5)

    sd = {}
    for i, sp in enumerate(ref_params["stacks"]):
        for j, blk in enumerate(sp["blocks"]):
            b = f"SDDCNN.{i}.DDCNN.{j}."
            for d in (1, 2, 4, 8):
                sd[b + f"Conv3D_{d}.layers.0.weight"] = np.asarray(
                    blk[f"d{d}"]["spatial"]["kernel"]).transpose(4, 3, 0, 1, 2)
                sd[b + f"Conv3D_{d}.layers.1.weight"] = np.asarray(
                    blk[f"d{d}"]["temporal"]["kernel"]).transpose(4, 3, 0, 1, 2)
            sd[b + "bn.weight"] = np.asarray(blk["bn"]["weight"])
            sd[b + "bn.bias"] = np.asarray(blk["bn"]["bias"])
            sd[b + "bn.running_mean"] = np.asarray(blk["bn"]["mean"])
            sd[b + "bn.running_var"] = np.asarray(blk["bn"]["var"])
    for src, dst in [("frame_sim_layer.projection",
                      ref_params["frame_sim"]["projection"]),
                     ("frame_sim_layer.fc", ref_params["frame_sim"]["fc"]),
                     ("color_hist_layer.fc", ref_params["color_hist"]["fc"]),
                     ("fc1", ref_params["fc1"]),
                     ("cls_layer1", ref_params["cls1"]),
                     ("cls_layer2", ref_params["cls2"])]:
        sd[src + ".weight"] = np.asarray(dst["kernel"]).T
        sd[src + ".bias"] = np.asarray(dst["bias"])

    loaded = TN.transnet_from_state_dict(sd, cfg)
    frames = rs.randint(0, 256, (1, 10, 27, 48, 3)).astype(np.uint8)
    a, _ = TN.transnet_forward(cfg, ref_params, jnp.asarray(frames))
    b, _ = TN.transnet_forward(cfg, loaded, jnp.asarray(frames))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    from frameino_tpu.preprocess.scene_cut import score_scene_cuts
    scorer = TN.make_transnet_scorer(loaded, cfg, window=8, overlap=2)
    video = rs.randint(0, 256, (20, 40, 60, 3)).astype(np.uint8)
    scores = score_scene_cuts(video, model=scorer)
    assert scores.shape == (20,)
    assert ((scores >= 0) & (scores <= 1)).all()
