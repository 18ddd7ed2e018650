"""HTTP serving API: healthz + a full generate round trip (tiny Wan)."""

import base64
import io
import json
import urllib.request

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def server():
    from frameino_tpu.app.server import PipelineServer
    from frameino_tpu.models import wan_dit, wan_vae
    from frameino_tpu.pipelines.wan_i2v import (WanImageToVideoPipeline,
                                                WanPipelineConfig)
    vae_cfg = wan_vae.WanVAEConfig(
        base_dim=8, z_dim=4, dim_mult=(1, 2), num_res_blocks=1,
        temperal_downsample=(True,), is_residual=False,
        scale_factor_temporal=2, scale_factor_spatial=2,
        latents_mean=(0.0,) * 4, latents_std=(1.0,) * 4)
    dit_cfg = wan_dit.tiny_config(in_channels=8, out_channels=4)
    key = jax.random.key(0)
    pipe = WanImageToVideoPipeline(
        dit_cfg, wan_dit.init_wan_dit(key, dit_cfg), vae_cfg,
        wan_vae.init_wan_vae(jax.random.fold_in(key, 1), vae_cfg),
        WanPipelineConfig())
    srv = PipelineServer(pipe, default_steps=2)
    httpd, port = srv.start_background()
    yield port
    httpd.shutdown()


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
        return json.load(r)


def _post(port, path, obj):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req) as r:
        return json.load(r)


def test_healthz(server):
    h = _get(server, "/healthz")
    assert h["status"] == "ok"
    assert h["pipeline"] == "WanImageToVideoPipeline"


def test_generate_roundtrip(server):
    from PIL import Image
    img = Image.fromarray(np.random.default_rng(0).integers(
        0, 255, (32, 64, 3), dtype=np.uint8), "RGB")
    buf = io.BytesIO()
    img.save(buf, "PNG")
    emb = np.zeros((8, 16), np.float32)      # [L, text_dim] for tiny cfg
    ebuf = io.BytesIO()
    np.save(ebuf, emb)
    out = _post(server, "/generate", {
        "image_b64": base64.b64encode(buf.getvalue()).decode(),
        "prompt_embeds_b64": base64.b64encode(ebuf.getvalue()).decode(),
        "trajectories": [[[5, 5], [40, 20]]],
        "height": 32, "width": 64, "num_frames": 9,
        "num_inference_steps": 2, "decode_mode": "full",
        "attn_impl": "xla",
    })
    assert out["num_frames"] == 9
    assert out["height"] == 32 and out["width"] == 64
    # bucketing: 32x64 rounds up to the 64-grid bucket; the response is
    # cropped back to the requested dims and reports the bucket it ran on
    assert out["bucket"] == [9, 64, 64]
    video = base64.b64decode(out["video_b64"])
    assert len(video) > 100                  # a real mp4 came back


def test_bad_request_is_400(server):
    req = urllib.request.Request(
        f"http://127.0.0.1:{server}/generate", data=b"{}",
        headers={"Content-Type": "application/json"})
    try:
        urllib.request.urlopen(req)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "error" in json.load(e)
