"""Multi-device paths on the virtual 8-device CPU mesh: data-parallel
training step, data-parallel sampling, and grad-sync correctness."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fmdm_tpu.parallel.mesh import batch_sharding, create_mesh, create_mesh_for_batch, replicate, shard_batch

pytestmark = pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device mesh")


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as g

    g.dryrun_multichip(len(jax.devices()))


def test_mesh_for_batch_divisibility():
    assert len(create_mesh_for_batch(16).devices.flatten()) == 8
    assert len(create_mesh_for_batch(6).devices.flatten()) == 6
    assert len(create_mesh_for_batch(5).devices.flatten()) == 5
    assert len(create_mesh_for_batch(1).devices.flatten()) == 1


def test_data_parallel_sampling_matches_single_device():
    """Engine output must be identical (up to f32 tolerance) with and without
    batch sharding over the mesh."""
    from fmdm_tpu.sample.engine import SamplingEngine
    from fmdm_tpu.schedulers import DDIMScheduler
    from tests.test_engine import _OracleModel

    x0 = jnp.tile(jnp.linspace(0.2, 0.8, 16).reshape(1, 1, 4, 4), (8, 1, 1, 1))
    sched = DDIMScheduler.create(num_train_timesteps=100)
    model = _OracleModel(sched, x0)
    ts = sched.set_timesteps(10)

    single = SamplingEngine(model, sched, ts)
    out_single = np.asarray(single({}, (8, 1, 4, 4), jax.random.PRNGKey(0)))

    mesh = create_mesh()
    sharded = SamplingEngine(model, sched, ts, mesh=mesh)
    out_sharded = np.asarray(sharded({}, (8, 1, 4, 4), jax.random.PRNGKey(0)))
    np.testing.assert_allclose(out_sharded, out_single, rtol=1e-5, atol=1e-5)


def test_sequence_parallel_sampling_matches_single_device():
    """SamplingEngine over a dp x sp mesh: the UNet's attention reshards
    tokens onto 'seq' and runs the ppermute ring; samples must match the
    single-device engine (same PRNG stream, f32)."""
    from fmdm_tpu.models.factories import DiffusionUNetFactory
    from fmdm_tpu.ops import attention as attention_ops
    from fmdm_tpu.sample.engine import SamplingEngine
    from fmdm_tpu.schedulers import DDIMScheduler
    from jax.sharding import Mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    unet = {
        "unet_impl": "diffusers_nd", "sample_size": 16, "in_channels": 1,
        "out_channels": 1, "layers_per_block": 1, "block_out_channels": [8, 16],
        "down_block_types": ["DownBlock2D", "AttnDownBlock2D"],
        "up_block_types": ["AttnUpBlock2D", "UpBlock2D"], "norm_num_groups": 4,
    }
    model = DiffusionUNetFactory().build(unet, None, 1)
    params = model.init(jax.random.PRNGKey(0))
    sched = DDIMScheduler.create(num_train_timesteps=50)
    ts = sched.set_timesteps(5)

    single = SamplingEngine(model, sched, ts)
    out_single = np.asarray(single(params, (8, 1, 16, 16), jax.random.PRNGKey(7)))

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("data", "seq"))
    try:
        attention_ops.set_sequence_parallel(mesh, "seq", min_tokens=1)
        sharded = SamplingEngine(model, sched, ts, mesh=mesh)
        out_sharded = np.asarray(sharded(params, (8, 1, 16, 16), jax.random.PRNGKey(7)))
    finally:
        attention_ops.clear_sequence_parallel()
    np.testing.assert_allclose(out_sharded, out_single, rtol=1e-4, atol=1e-4)


def test_engine_isolated_from_foreign_seq_context():
    """A trainer's process-global sequence-parallel routing must NOT leak into
    an engine jitted over a different device set (e.g. the rank-0 visual
    probe's 5-device DP-sampling mesh while training runs dp x sp over 8):
    the engine scopes the routing to its own mesh for the whole call."""
    from fmdm_tpu.models.factories import DiffusionUNetFactory
    from fmdm_tpu.ops import attention as attention_ops
    from fmdm_tpu.sample.engine import SamplingEngine
    from fmdm_tpu.schedulers import DDIMScheduler
    from jax.sharding import Mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    unet = {
        "unet_impl": "diffusers_nd", "sample_size": 16, "in_channels": 1,
        "out_channels": 1, "layers_per_block": 1, "block_out_channels": [8, 16],
        "down_block_types": ["DownBlock2D", "AttnDownBlock2D"],
        "up_block_types": ["AttnUpBlock2D", "UpBlock2D"], "norm_num_groups": 4,
    }
    model = DiffusionUNetFactory().build(unet, None, 1)
    params = model.init(jax.random.PRNGKey(0))
    sched = DDIMScheduler.create(num_train_timesteps=50)
    ts = sched.set_timesteps(3)

    train_mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("data", "seq"))
    probe_mesh = create_mesh(5)  # deliberately incompatible with the 8-dev dp x sp
    try:
        attention_ops.set_sequence_parallel(train_mesh, "seq", min_tokens=1)
        probe = SamplingEngine(model, sched, ts, mesh=probe_mesh)
        out = np.asarray(probe(params, (5, 1, 16, 16), jax.random.PRNGKey(1)))
        assert np.all(np.isfinite(out))
        # the trainer's routing survives the engine call untouched
        ctx = attention_ops.get_sequence_parallel()
        assert ctx is not None and ctx[0] == train_mesh and ctx[2] == 1
    finally:
        attention_ops.clear_sequence_parallel()


def test_dp_sampling_decode_matches_disabled():
    """decode_diffusion_batch auto-shards the reverse scan over local devices
    (default-on, beyond reference); output matches the unsharded path and the
    engine cache records the mesh size."""
    from fmdm_tpu.models.factories import DiffusionUNetFactory
    from fmdm_tpu.sample import diffusion_utils as du

    unet = {
        "unet_impl": "diffusers_nd", "sample_size": 16, "in_channels": 1,
        "out_channels": 1, "layers_per_block": 1, "block_out_channels": [8, 8],
        "down_block_types": ["DownBlock2D", "DownBlock2D"],
        "up_block_types": ["UpBlock2D", "UpBlock2D"], "norm_num_groups": 4,
    }
    model = DiffusionUNetFactory().build(unet, None, 1)
    params = model.init(jax.random.PRNGKey(0))
    training_cfg = {"num_train_timesteps": 50, "num_inference_steps": 5,
                    "scheduler": "ddim", "conditioning": None}
    shape = (8, 1, 16, 16)
    try:
        du.set_dp_sampling(False)
        out_off = np.asarray(du.decode_diffusion_batch(
            model, params, training_cfg, {}, shape, None, rng=jax.random.PRNGKey(3)))
        du.set_dp_sampling(True)
        out_on = np.asarray(du.decode_diffusion_batch(
            model, params, training_cfg, {}, shape, None, rng=jax.random.PRNGKey(3)))
    finally:
        du.set_dp_sampling(True)
    n_dev = len(jax.local_devices())
    assert any(k[0] == id(model) and k[-3] == n_dev for k in du._ENGINE_CACHE), \
        "DP engine must be cached with the mesh size (key slot -3, before deep_cache/quantize)"
    np.testing.assert_allclose(out_on, out_off, rtol=1e-5, atol=1e-5)


def test_gradients_are_globally_synced():
    """The whole point of the mesh DP train step: identical params after a
    step regardless of device count (the reference's DDP never syncs grads —
    SURVEY.md §2.2)."""
    from fmdm_tpu.models.factories import DiffusionUNetFactory
    from fmdm_tpu.schedulers import DDPMScheduler
    from fmdm_tpu.train.common import make_adamw, make_denoise_train_step
    from fmdm_tpu.nn.module import flatten_params

    unet = {
        "unet_impl": "diffusers_nd", "in_channels": 1, "out_channels": 1,
        "layers_per_block": 1, "block_out_channels": [8, 8], "norm_num_groups": 4,
        "down_block_types": ["DownBlock2D", "DownBlock2D"],
        "up_block_types": ["UpBlock2D", "UpBlock2D"],
    }
    model = DiffusionUNetFactory().build(unet, None, 1)
    init_params = model.init(jax.random.PRNGKey(0))
    sched = DDPMScheduler.create(num_train_timesteps=20)
    opt, _ = make_adamw(1e-2, 0.0, 0, 100)

    batch = {
        "target": jnp.tile(jnp.linspace(0, 1, 64).reshape(1, 1, 8, 8), (8, 1, 1, 1)),
        "image": None,
        "valid": jnp.ones((8,), jnp.float32),
    }
    rng = jax.random.PRNGKey(3)

    results = []
    for n_dev in (1, 8):
        mesh = create_mesh(n_dev)
        # the jitted step donates params/opt_state; give each run its own copy
        params = replicate(mesh, jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), init_params))
        opt_state = replicate(mesh, opt.init(params))
        step = make_denoise_train_step(model, sched, opt, variant="diffusion",
                                       conditioning_mode=None, latent_norm=None, mesh=mesh)
        placed = {
            "target": shard_batch(mesh, batch["target"]),
            "image": None,
            "valid": shard_batch(mesh, batch["valid"]),
        }
        new_params, _, loss_sum, count = step(params, opt_state, placed, rng)
        results.append((jax.tree_util.tree_map(np.asarray, new_params), float(loss_sum), float(count)))

    (p1, l1, c1), (p8, l8, c8) = results
    assert c1 == c8 == 8
    np.testing.assert_allclose(l1, l8, rtol=1e-4)
    f1, f8 = flatten_params(p1), flatten_params(p8)
    # Adam's rsqrt normalization amplifies f32 reduction-order noise near step 1;
    # true missing grad-sync would diverge at O(lr)=1e-2, so atol=1e-3 separates
    # the failure mode cleanly.
    for k in f1:
        np.testing.assert_allclose(f1[k], f8[k], rtol=5e-2, atol=1e-3, err_msg=k)


def test_gradients_match_pre_optimizer_tight():
    """Pre-optimizer gradients (no Adam rsqrt amplification) must match
    between 1-device and 8-device data parallelism at ~1e-5 — separates f32
    reduction-order noise from a real grad-sync divergence."""
    from fmdm_tpu.models.factories import DiffusionUNetFactory
    from fmdm_tpu.nn.module import flatten_params
    from fmdm_tpu.schedulers import DDPMScheduler

    unet = {
        "unet_impl": "diffusers_nd", "in_channels": 1, "out_channels": 1,
        "layers_per_block": 1, "block_out_channels": [8, 8], "norm_num_groups": 4,
        "down_block_types": ["DownBlock2D", "DownBlock2D"],
        "up_block_types": ["UpBlock2D", "UpBlock2D"],
    }
    model = DiffusionUNetFactory().build(unet, None, 1)
    init_params = model.init(jax.random.PRNGKey(0))
    sched = DDPMScheduler.create(num_train_timesteps=20)

    target = jnp.tile(jnp.linspace(0, 1, 64).reshape(1, 1, 8, 8), (8, 1, 1, 1))
    rng = jax.random.PRNGKey(3)

    def loss_fn(params, x0):
        rng_noise, rng_t = jax.random.split(rng)
        noise = jax.random.normal(rng_noise, x0.shape, jnp.float32)
        t = jax.random.randint(rng_t, (x0.shape[0],), 0, 20)
        noisy = sched.add_noise(x0, noise, t)
        pred = model(params, noisy, t)
        return jnp.mean(jnp.square(pred - noise))

    grads = []
    for n_dev in (1, 8):
        mesh = create_mesh(n_dev)
        params = replicate(mesh, init_params)
        x0 = shard_batch(mesh, target)
        g = jax.jit(jax.grad(loss_fn))(params, x0)
        grads.append(flatten_params(jax.tree_util.tree_map(np.asarray, g)))

    g1, g8 = grads
    # normalize by the per-tensor scale floored at 1e-3 of the global scale:
    # mathematically-zero grads (e.g. to_k.bias — softmax is invariant to a
    # uniform key-bias shift) are pure f32 noise and must not be graded
    # noise-over-noise.
    global_scale = max(float(np.abs(v).max()) for v in g1.values())
    for k in g1:
        scale = max(float(np.abs(g1[k]).max()), 1e-3 * global_scale)
        np.testing.assert_allclose(g8[k] / scale, g1[k] / scale, atol=2e-5, err_msg=k)


def test_vae_engine_dp_runner_shards_and_crops():
    """The autoencoder engines' data-parallel runner: batch sharded over the
    mesh, ragged batches edge-padded then cropped, values identical to the
    single-device computation."""
    import numpy as np
    import jax
    from fmdm_tpu.sample.autoencoder_like import _make_dp_fn

    params = {"scale": np.float32(2.0)}
    core = lambda p, x: x * p["scale"]
    run = _make_dp_fn(core, params, batch_size=8)

    x = np.random.randn(8, 1, 4, 4).astype(np.float32)
    out, real = run(x)
    assert real == 8
    assert len(out.sharding.device_set) == 8  # actually sharded over the mesh
    np.testing.assert_allclose(np.asarray(out), x * 2.0, rtol=1e-6)

    ragged = x[:5]
    out2, real2 = run(ragged)
    assert real2 == 5
    np.testing.assert_allclose(np.asarray(out2)[:5], ragged * 2.0, rtol=1e-6)


def test_fsdp_shards_state_and_matches_replicated_dp():
    """FSDP (parallel/fsdp.py): params + AdamW moments live sliced over the
    data axis (~N× per-device memory), while one train step produces the same
    loss and (gathered) parameters as replicated DP — XLA inserts the
    gathers/reduce-scatters, the math is unchanged."""
    from fmdm_tpu.models.factories import DiffusionUNetFactory
    from fmdm_tpu.parallel.fsdp import fsdp_param_specs, shard_opt_state_fsdp, shard_params_fsdp
    from fmdm_tpu.schedulers import DDPMScheduler
    from fmdm_tpu.train.common import make_adamw, make_denoise_train_step
    from fmdm_tpu.nn.module import flatten_params

    unet = {
        "unet_impl": "diffusers_nd", "in_channels": 1, "out_channels": 1,
        "layers_per_block": 1, "block_out_channels": [8, 8], "norm_num_groups": 4,
        "down_block_types": ["DownBlock2D", "DownBlock2D"],
        "up_block_types": ["UpBlock2D", "UpBlock2D"],
    }
    model = DiffusionUNetFactory().build(unet, None, 1)
    init_params = model.init(jax.random.PRNGKey(0))
    sched = DDPMScheduler.create(num_train_timesteps=20)
    opt, _ = make_adamw(1e-2, 0.0, 0, 100)
    batch = {
        "target": jnp.tile(jnp.linspace(0, 1, 64).reshape(1, 1, 8, 8), (8, 1, 1, 1)),
        "image": None,
        "valid": jnp.ones((8,), jnp.float32),
    }
    rng = jax.random.PRNGKey(3)
    mesh = create_mesh(8)

    # sharding actually shrinks per-device state: every 8-divisible tensor is
    # sliced, and at least the big conv kernels must be
    specs = fsdp_param_specs(init_params, mesh)
    sharded_leaves = [s for s in jax.tree_util.tree_leaves(
        specs, is_leaf=lambda x: hasattr(x, "index")) if tuple(s) != ()]
    assert len(sharded_leaves) > 0

    results = {}
    for kind in ("replicated", "fsdp"):
        params = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), init_params)
        if kind == "fsdp":
            params = shard_params_fsdp(params, mesh)
            opt_state = shard_opt_state_fsdp(opt.init(params), params, mesh)
        else:
            params = replicate(mesh, params)
            opt_state = replicate(mesh, opt.init(params))
        step = make_denoise_train_step(model, sched, opt, variant="diffusion",
                                       conditioning_mode=None, latent_norm=None, mesh=mesh)
        placed = {
            "target": shard_batch(mesh, batch["target"]),
            "image": None,
            "valid": shard_batch(mesh, batch["valid"]),
        }
        new_params, new_opt, loss_sum, count = step(params, opt_state, placed, rng)
        if kind == "fsdp":
            # the updated params must STAY sharded (ZeRO property, not a
            # gather-back-to-replicated step)
            some_sharded = any(
                not leaf.sharding.is_fully_replicated
                for leaf in jax.tree_util.tree_leaves(new_params)
                if hasattr(leaf, "sharding") and leaf.size >= 8
            )
            assert some_sharded
        results[kind] = (jax.tree_util.tree_map(np.asarray, new_params), float(loss_sum))

    (p_rep, l_rep), (p_fsdp, l_fsdp) = results["replicated"], results["fsdp"]
    np.testing.assert_allclose(l_rep, l_fsdp, rtol=1e-5)
    # post-Adam params: reduce-scatter vs all-reduce reduction order perturbs
    # near-zero grads, and Adam's rsqrt amplifies that noise (same bound as
    # the replicated DP sync test's justification)
    flat_rep, flat_fsdp = flatten_params(p_rep), flatten_params(p_fsdp)
    for key in flat_rep:
        np.testing.assert_allclose(flat_fsdp[key], flat_rep[key], rtol=5e-2, atol=1e-3,
                                   err_msg=key)


def test_trainer_accepts_fsdp_flag(tmp_path):
    import json

    from tests.test_train_e2e import TinyMNIST, _write_cfg
    from fmdm_tpu.train.diffusion_lib import train

    cfg_path = _write_cfg(tmp_path, "diffusion", "ddpm")
    cfg = json.loads(cfg_path.read_text())
    cfg["training"]["fsdp"] = True
    cfg_path.write_text(json.dumps(cfg))
    ds = TinyMNIST(tmp_path / "data", train=True)
    run_dir = train(ds, cfg_path)
    lines = (run_dir / "metrics.csv").read_text().strip().splitlines()
    assert len(lines) >= 2 and np.isfinite(float(lines[-1].split(",")[1]))


def test_ema_shadow_consistent_across_device_counts():
    """training.ema_decay composes with the DP mesh: the EMA update is
    elementwise over the (replicated) params, so 1-device and 8-device runs
    must produce the same shadow weights, and the shadow must equal the
    recurrence ema = decay*ema + (1-decay)*params over the live trajectory."""
    from fmdm_tpu.models.factories import DiffusionUNetFactory
    from fmdm_tpu.nn.module import flatten_params
    from fmdm_tpu.schedulers import DDPMScheduler
    from fmdm_tpu.train.common import make_adamw, make_denoise_train_step

    unet = {
        "unet_impl": "diffusers_nd", "in_channels": 1, "out_channels": 1,
        "layers_per_block": 1, "block_out_channels": [8, 8], "norm_num_groups": 4,
        "down_block_types": ["DownBlock2D", "DownBlock2D"],
        "up_block_types": ["UpBlock2D", "UpBlock2D"],
    }
    model = DiffusionUNetFactory().build(unet, None, 1)
    init_params = model.init(jax.random.PRNGKey(0))
    sched = DDPMScheduler.create(num_train_timesteps=20)
    opt, _ = make_adamw(1e-2, 0.0, 0, 100)
    decay = 0.5

    batch = {
        "target": jnp.tile(jnp.linspace(0, 1, 64).reshape(1, 1, 8, 8), (8, 1, 1, 1)),
        "image": None,
        "valid": jnp.ones((8,), jnp.float32),
    }
    rng = jax.random.PRNGKey(3)

    results = []
    for n_dev in (1, 8):
        mesh = create_mesh(n_dev)
        params = replicate(mesh, jax.tree_util.tree_map(
            lambda x: jnp.array(x, copy=True), init_params))
        opt_state = replicate(mesh, opt.init(params))
        ema = replicate(mesh, jax.tree_util.tree_map(
            lambda x: jnp.array(x, copy=True), init_params))
        step = make_denoise_train_step(
            model, sched, opt, variant="diffusion", conditioning_mode=None,
            latent_norm=None, mesh=mesh, ema_decay=decay)
        placed = {
            "target": shard_batch(mesh, batch["target"]),
            "image": None,
            "valid": shard_batch(mesh, batch["valid"]),
        }
        for _ in range(2):
            params, opt_state, ema, _, _ = step(params, opt_state, ema, placed, rng)
        results.append((jax.tree_util.tree_map(np.asarray, params),
                        jax.tree_util.tree_map(np.asarray, ema)))

    (p1, e1), (p8, e8) = results
    fe1, fe8 = flatten_params(e1), flatten_params(e8)
    for k in fe1:
        np.testing.assert_allclose(fe1[k], fe8[k], rtol=5e-2, atol=1e-3, err_msg=k)
    # shadow lags the live params and sits between init and live
    fp1, fi = flatten_params(p1), flatten_params(init_params)
    moved = [k for k in fp1 if not np.allclose(fp1[k], np.asarray(fi[k]))]
    assert moved, "params never moved"
    k = moved[0]
    assert not np.allclose(fe1[k], fp1[k]), "EMA tracked live params exactly"


def test_fsdp_tp_specs_disjoint_axes():
    """2-D layout rule: no dim carries both axes; TP keeps dim0 when
    divisible; FSDP takes the largest remaining divisible dim."""
    from jax.sharding import PartitionSpec as P

    from fmdm_tpu.parallel.fsdp import fsdp_tp_leaf_spec

    # conv kernel (O, I, kh, kw): O=16 over model(2), I=8 over data(4)
    assert fsdp_tp_leaf_spec((16, 8, 3, 3), 4, 2) == P("model", "data", None, None)
    # bias (16,): TP takes dim0, nothing left for FSDP
    assert fsdp_tp_leaf_spec((16,), 4, 2) == P("model")
    # odd lead dim: TP can't slice -> pure FSDP on the largest divisible dim
    assert fsdp_tp_leaf_spec((7, 12), 4, 2) == P(None, "data")
    # nothing divisible -> replicate
    assert fsdp_tp_leaf_spec((7, 5), 4, 2) == P(None, None)


def test_fsdp_tp_update_matches_replicated_dp():
    """training.tensor_parallel + training.fsdp together (2-D pod layout):
    the post-step parameters must equal the replicated-DP run — the layout
    changes where state lives, never the math."""
    from jax.sharding import Mesh

    from fmdm_tpu.models.factories import DiffusionUNetFactory
    from fmdm_tpu.nn.module import flatten_params
    from fmdm_tpu.parallel.fsdp import shard_opt_state_fsdp_tp, shard_params_fsdp_tp
    from fmdm_tpu.schedulers import DDPMScheduler
    from fmdm_tpu.train.common import make_adamw, make_denoise_train_step

    unet = {
        "unet_impl": "diffusers_nd", "in_channels": 1, "out_channels": 1,
        "layers_per_block": 1, "block_out_channels": [8, 8], "norm_num_groups": 4,
        "down_block_types": ["DownBlock2D", "DownBlock2D"],
        "up_block_types": ["UpBlock2D", "UpBlock2D"],
    }
    model = DiffusionUNetFactory().build(unet, None, 1)
    init_params = model.init(jax.random.PRNGKey(0))
    sched = DDPMScheduler.create(num_train_timesteps=20)
    opt, _ = make_adamw(1e-2, 0.0, 0, 100)

    batch = {
        "target": jnp.tile(jnp.linspace(0, 1, 64).reshape(1, 1, 8, 8), (8, 1, 1, 1)),
        "image": None,
        "valid": jnp.ones((8,), jnp.float32),
    }
    rng = jax.random.PRNGKey(3)

    results = []
    for layout in ("dp", "fsdp_tp"):
        src = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), init_params)
        if layout == "dp":
            mesh = create_mesh(8)
            params = replicate(mesh, src)
            opt_state = replicate(mesh, opt.init(params))
        else:
            mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("data", "model"))
            params = shard_params_fsdp_tp(src, mesh)
            opt_state = shard_opt_state_fsdp_tp(opt.init(params), params, mesh)
        step = make_denoise_train_step(model, sched, opt, variant="diffusion",
                                       conditioning_mode=None, latent_norm=None, mesh=mesh)
        placed = {
            "target": shard_batch(mesh, batch["target"]),
            "image": None,
            "valid": shard_batch(mesh, batch["valid"]),
        }
        new_params, _, loss_sum, count = step(params, opt_state, placed, rng)
        results.append((jax.tree_util.tree_map(np.asarray, new_params),
                        float(loss_sum), float(count)))

    (p_dp, l_dp, c_dp), (p_2d, l_2d, c_2d) = results
    assert c_dp == c_2d == 8
    np.testing.assert_allclose(l_dp, l_2d, rtol=1e-4)
    f_dp, f_2d = flatten_params(p_dp), flatten_params(p_2d)
    for k in f_dp:
        np.testing.assert_allclose(f_dp[k], f_2d[k], rtol=5e-2, atol=1e-3, err_msg=k)
