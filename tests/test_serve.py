"""Serving subsystem tests: engine, micro-batcher, HTTP front end.

Runs on the CPU backend with tiny-but-real models (the flux-debug pattern):
engine programs compile in seconds; the HTTP test drives a live server on an
ephemeral port with concurrent clients and asserts batching happened.
"""

import io
import json
import threading
import time
import urllib.request

import jax.numpy as jnp
import numpy as np
import pytest

from genhancer_tpu.models import dit as dit_m
from genhancer_tpu.models import vae as vae_m
from genhancer_tpu.models.towers import clip as clip_m
from genhancer_tpu.serve.batcher import MicroBatcher, Stats
from genhancer_tpu.serve.engine import InferenceEngine
from genhancer_tpu.serve.http import ServeApp
from genhancer_tpu.tasks import image as image_task


TINY_DIT = dit_m.DiTConfig(in_channels=16, vec_in_dim=24, context_in_dim=32,
                           hidden_size=64, num_heads=4, depth=1,
                           depth_single_blocks=1, axes_dim=(4, 6, 6))
TINY_VAE = vae_m.VAEConfig(resolution=32, ch=8, ch_mult=(1, 2), num_res_blocks=1,
                           z_channels=4)
TINY_TOWER = clip_m.CLIPConfig(
    vision=clip_m.CLIPVisionConfig(hidden_size=16, intermediate_size=32,
                                   num_layers=1, num_heads=2, image_size=32,
                                   patch_size=16),
    text=clip_m.CLIPTextConfig(hidden_size=16, intermediate_size=32,
                               num_layers=1, num_heads=2, vocab_size=50,
                               max_position_embeddings=8),
    projection_dim=24)


def make_engine(buckets=(1, 4), num_steps=2, quant="none", **kw):
    import jax
    spec = image_task.TaskSpec(
        stage="stage1", tower_kind="clip", img_size=32, clip_image_size=32,
        dit_cfg=TINY_DIT, vae_cfg=TINY_VAE, tower_cfg=TINY_TOWER,
        clip_dim=24, t5_dim=32, compute_dtype=jnp.float32)
    modules = image_task.init_modules(jax.random.key(0), spec)
    params = {"dit": modules["dit"], "vae": modules["vae"],
              "clip": modules["clip"]}
    return InferenceEngine(spec, params, num_steps=num_steps,
                           buckets=buckets, quant=quant, **kw)


@pytest.fixture(scope="module")
def engine():
    return make_engine()


class TestEngine:
    def test_reconstruct_shape_range(self, engine, rng):
        img = rng.random((2, 32, 32, 3), dtype=np.float32)
        out = engine.reconstruct(img, seed=0)
        assert out.shape == (2, 32, 32, 3)
        assert out.min() >= 0.0 and out.max() <= 1.0
        assert np.isfinite(out).all()

    def test_padding_matches_exact_bucket(self, engine, rng):
        """A sub-bucket batch (padded to 4) must give the same result rows
        as the same images at full bucket occupancy with the same seed."""
        img = rng.random((4, 32, 32, 3), dtype=np.float32)
        full = engine.reconstruct(img, seed=7)
        part = engine.reconstruct(img[:3], seed=7)
        np.testing.assert_allclose(part, full[:3], atol=1e-5)

    def test_embed(self, engine, rng):
        img = rng.random((3, 32, 32, 3), dtype=np.float32)
        emb = engine.embed(img)
        assert emb.shape == (3, TINY_TOWER.projection_dim)
        # embedding must match the tower run directly (no batching artifacts)
        one = engine.embed(img[:1])
        np.testing.assert_allclose(one[0], emb[0], atol=1e-5)

    def test_oversize_batch_rejected(self, engine, rng):
        with pytest.raises(ValueError, match="exceeds max bucket"):
            engine.reconstruct(rng.random((5, 32, 32, 3), dtype=np.float32))

    def test_seedless_calls_differ(self, engine, rng):
        img = rng.random((1, 32, 32, 3), dtype=np.float32)
        a = engine.reconstruct(img)
        b = engine.reconstruct(img)
        assert np.abs(a - b).max() > 1e-6   # fresh noise per request

    def test_int8_engine_tracks_exact(self, engine, rng):
        """quant='int8' statically quantizes all serving trees; outputs must
        track the exact engine at the per-channel-int8 drift level."""
        # identical buckets: the padded noise draw must match the exact
        # engine's for a same-seed comparison
        q_engine = make_engine(quant="int8")
        img = rng.random((2, 32, 32, 3), dtype=np.float32)
        emb_q = q_engine.embed(img)
        emb = engine.embed(img)
        scale = np.abs(emb).max()
        np.testing.assert_allclose(emb_q, emb, atol=0.05 * scale)
        rec_q = q_engine.reconstruct(img, seed=3)
        rec = engine.reconstruct(img, seed=3)
        assert np.isfinite(rec_q).all()
        # 2 sampler steps compound the drift; just require close agreement
        assert np.abs(rec_q - rec).mean() < 0.05, np.abs(rec_q - rec).mean()


class TestUint8Wire:
    """wire_dtype='uint8' (VERDICT r4 #5): /255 and round(*255) move inside
    the jit so pixels cross host<->device as 1 B/px.  uint8/255 in f32 is
    exact, so on uint8-SOURCED inputs the uint8-wire engine must match the
    float32-wire engine to the output-quantization step (<= 1/255 + fp
    noise), and embeddings bit-for-bit-ish."""

    @pytest.fixture(scope="class")
    def u8_engine(self):
        return make_engine(wire_dtype="uint8")

    def test_reconstruct_dtype_and_match(self, engine, u8_engine, rng):
        img_u8 = (rng.random((2, 32, 32, 3)) * 255).astype(np.uint8)
        out_u8 = u8_engine.reconstruct(img_u8, seed=0)
        assert out_u8.dtype == np.uint8
        out_f = engine.reconstruct(img_u8, seed=0)   # f32 wire accepts uint8
        assert out_f.dtype == np.float32
        np.testing.assert_allclose(out_u8.astype(np.float32) / 255.0, out_f,
                                   atol=1.01 / 255.0 + 1e-5)

    def test_embed_matches_float_wire(self, engine, u8_engine, rng):
        img_u8 = (rng.random((3, 32, 32, 3)) * 255).astype(np.uint8)
        emb_u8 = u8_engine.embed(img_u8)
        assert emb_u8.dtype == np.float32
        np.testing.assert_allclose(emb_u8, engine.embed(img_u8), atol=1e-5)

    def test_float_input_accepted_on_uint8_wire(self, u8_engine, rng):
        # host quantizes float [0,1] -> uint8 before the transfer
        img = rng.random((1, 32, 32, 3), dtype=np.float32)
        out = u8_engine.reconstruct(img, seed=2)
        assert out.dtype == np.uint8 and out.shape == (1, 32, 32, 3)

    def test_transfer_bytes_actually_shrink(self, u8_engine):
        # the device-side program must consume uint8 (not a host-upcast
        # float): check via the jitted fn's input aval
        import jax
        img = np.zeros((1, 32, 32, 3), np.uint8)
        placed = u8_engine._place(u8_engine._wire(img))
        assert placed.dtype == jnp.uint8

    def test_bad_wire_dtype_rejected(self):
        with pytest.raises(ValueError, match="wire_dtype"):
            make_engine(wire_dtype="bf16")


class TestMultiChipEngine:
    """Multi-chip serving: the mesh-sharded engine must reproduce the
    single-device engine — parallelism is placement, not math (8 virtual
    CPU devices via conftest).  Covers mesh DP (batch over the data axis),
    DiT TP (training placements reused at serve time), int8 x TP (the
    weight_q/w_scale factor leaves shard like the weight they replace),
    and the bucket round-up to data-axis multiples."""

    def test_dp_matches_single_device(self, engine, rng):
        eng = make_engine(buckets=(4,), num_devices=2)
        img = rng.random((4, 32, 32, 3), dtype=np.float32)
        np.testing.assert_allclose(eng.reconstruct(img, seed=3),
                                   engine.reconstruct(img, seed=3), atol=2e-5)
        np.testing.assert_allclose(eng.embed(img), engine.embed(img),
                                   atol=2e-5)

    def test_dp_tp_matches_single_device(self, engine, rng):
        eng = make_engine(buckets=(4,), num_devices=4, model_parallel=2)
        img = rng.random((4, 32, 32, 3), dtype=np.float32)
        np.testing.assert_allclose(eng.reconstruct(img, seed=5),
                                   engine.reconstruct(img, seed=5), atol=2e-5)

    def test_int8_tp_engine_runs(self, rng):
        ref = make_engine(buckets=(2,), quant="int8")
        eng = make_engine(buckets=(2,), quant="int8", num_devices=2,
                          model_parallel=2)
        img = rng.random((2, 32, 32, 3), dtype=np.float32)
        np.testing.assert_allclose(eng.reconstruct(img, seed=1),
                                   ref.reconstruct(img, seed=1), atol=2e-5)

    def test_model_parallel_alone_implies_devices(self, engine, rng):
        # --model_parallel without --num_devices: dp1 x tpN mesh (the
        # engine raises num_devices to model_parallel instead of building
        # an indivisible 1-device mesh)
        eng = make_engine(buckets=(2,), model_parallel=2)
        assert eng.mesh is not None and eng.mesh.shape["model"] == 2
        img = rng.random((2, 32, 32, 3), dtype=np.float32)
        np.testing.assert_allclose(eng.reconstruct(img, seed=7),
                                   engine.reconstruct(img, seed=7), atol=2e-5)

    def test_buckets_round_up_to_data_axis(self, rng):
        eng = make_engine(buckets=(1, 4), num_devices=2)
        assert eng.buckets == (2, 4)
        # a 1-image request pads to the rounded bucket and still works
        out = eng.reconstruct(rng.random((1, 32, 32, 3), dtype=np.float32),
                              seed=0)
        assert out.shape == (1, 32, 32, 3) and np.isfinite(out).all()


class TestMicroBatcher:
    def test_groups_concurrent_requests(self):
        calls = []

        def process(batch):
            calls.append(batch.shape[0])
            time.sleep(0.02)
            return batch * 2.0

        mb = MicroBatcher(process, max_batch=4, max_wait_ms=100.0)
        try:
            items = [np.full((2, 2), float(i), np.float32) for i in range(6)]
            futs = [mb.submit(x) for x in items]
            outs = [f.result(timeout=10) for f in futs]
            for x, o in zip(items, outs):
                np.testing.assert_allclose(o, x * 2.0)
            # 6 requests submitted at once with bucket 4 -> executed as
            # groups (at least one multi-request batch, none above 4)
            assert max(calls) <= 4
            assert max(calls) > 1
            assert sum(calls) == 6
            snap = mb.stats.snapshot()
            assert snap["requests"] == 6
            assert snap["latency_ms"]["p50"] is not None
        finally:
            mb.close()

    def test_error_propagates_to_waiters(self):
        def boom(batch):
            raise RuntimeError("device on fire")

        mb = MicroBatcher(boom, max_batch=2, max_wait_ms=5.0)
        try:
            fut = mb.submit(np.zeros((1,), np.float32))
            with pytest.raises(RuntimeError, match="device on fire"):
                fut.result(timeout=10)
            assert mb.stats.snapshot()["errors"] == 1
        finally:
            mb.close()

    def test_queue_full_rejects(self):
        release = threading.Event()

        def block(batch):
            release.wait(5)
            return batch

        mb = MicroBatcher(block, max_batch=1, max_wait_ms=1.0, max_queue=1)
        try:
            futs = [mb.submit(np.zeros((1,), np.float32)) for _ in range(8)]
            release.set()
            results = []
            for f in futs:
                try:
                    results.append(f.result(timeout=10))
                except RuntimeError as e:
                    results.append(e)
            assert any(isinstance(r, RuntimeError) for r in results)
            assert any(isinstance(r, np.ndarray) for r in results)
        finally:
            mb.close()


def _jpeg_bytes(rng, size=48) -> bytes:
    from PIL import Image
    arr = (rng.random((size, size, 3)) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG")
    return buf.getvalue()


@pytest.mark.slow
class TestHTTP:
    @pytest.fixture(scope="class")
    def server(self):
        engine = make_engine(buckets=(1, 4), num_steps=2)
        engine.warmup()
        app = ServeApp(engine, max_wait_ms=20.0)
        server, _thread = app.serve_background(port=0)
        url = f"http://127.0.0.1:{server.server_address[1]}"
        yield url
        app.close()

    def test_healthz(self, server):
        with urllib.request.urlopen(f"{server}/healthz", timeout=30) as r:
            body = json.loads(r.read())
        assert body["status"] == "ok"
        assert body["buckets"] == [1, 4]

    def test_reconstruct_roundtrip(self, server, rng):
        from PIL import Image
        req = urllib.request.Request(
            f"{server}/v1/reconstruct", data=_jpeg_bytes(rng),
            headers={"Content-Type": "image/jpeg"})
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.headers["Content-Type"] == "image/jpeg"
            out = Image.open(io.BytesIO(r.read()))
        assert out.size == (32, 32)

    def test_embed_json_b64(self, server, rng):
        import base64
        payload = json.dumps(
            {"image_b64": base64.b64encode(_jpeg_bytes(rng)).decode()}).encode()
        req = urllib.request.Request(
            f"{server}/v1/embed", data=payload,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            body = json.loads(r.read())
        assert body["dim"] == TINY_TOWER.projection_dim
        assert len(body["embedding"]) == TINY_TOWER.projection_dim

    def test_concurrent_requests_batched(self, server, rng):
        imgs = [_jpeg_bytes(rng) for _ in range(6)]
        errs, done = [], []

        def post(data):
            req = urllib.request.Request(
                f"{server}/v1/embed", data=data,
                headers={"Content-Type": "image/jpeg"})
            try:
                with urllib.request.urlopen(req, timeout=120) as r:
                    done.append(json.loads(r.read()))
            except Exception as e:  # pragma: no cover
                errs.append(e)

        threads = [threading.Thread(target=post, args=(d,)) for d in imgs]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert not errs and len(done) == 6
        with urllib.request.urlopen(f"{server}/v1/stats", timeout=30) as r:
            stats = json.loads(r.read())
        hist = stats["embed"]["batch_histogram"]
        assert sum(int(k) * v for k, v in hist.items()) >= 6
        assert any(int(k) > 1 for k in hist)   # batching actually occurred

    def test_bad_request(self, server):
        req = urllib.request.Request(
            f"{server}/v1/reconstruct", data=b"not an image",
            headers={"Content-Type": "image/jpeg"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 400

    def test_unknown_path(self, server):
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(f"{server}/nope", timeout=30)
        assert ei.value.code == 404
