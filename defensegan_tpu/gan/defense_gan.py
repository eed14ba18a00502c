"""DefenseGAN: the user-facing model tying config + models + training + defense.

Reference parity: models/gan.py::DefenseGANBase and its MnistDefenseGAN /
FMnist / CelebA subclasses plus models/base_model.py session+saver plumbing of
kabkabm/defensegan. One class here covers all datasets — the per-dataset
differences are entirely in the config (see configs/gans/*.yml) and the
generator/critic factories.

API mirrors the reference: train(), reconstruct(x, back_prop=...),
generate(), save(), load().
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from defensegan_tpu.ckpt import latest_step, restore_checkpoint, save_checkpoint
from defensegan_tpu.configs import Config, save_config
from defensegan_tpu.defense.project import (ReconstructionResult, reconstruct,
                                            sample_z0)
from defensegan_tpu.gan.train import (GANState, build_optimizers,
                                      init_gan_state, make_data_train_step)
from defensegan_tpu.models import critic_for, generator_for
from defensegan_tpu.models.generator import to_image_space
from defensegan_tpu.parallel import make_mesh
from defensegan_tpu.utils.misc import append_jsonl, ensure_dir
from defensegan_tpu.utils.visualize import save_images


def _dtype_of(name: str):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16,
            "bf16": jnp.bfloat16, "f32": jnp.float32}[name.lower()]


def resolve_projection_kernel(gan, *, n: int, back_prop: bool = False,
                              requested: Optional[str] = None,
                              on_tpu: Optional[bool] = None) -> str:
    """Resolve which projection path actually runs — the SINGLE source of
    truth shared by DefenseGAN.reconstruct and bench.py (they previously
    duplicated this logic and could drift).

    n = batch * rec_rr (the Pallas kernels' grid-divisibility input).
    Returns one of 'pallas' | 'pallas_int8' | 'pallas_v4' | 'packed' |
    'xla', where the pallas values are guaranteed runnable for this
    (topology, n, back_prop, backend); every guard failure degrades to
    the measured per-arch best XLA path ('packed' for wide, 'xla' for
    deep — RESULTS.md), never the slowest generic path. pallas_v4 (the
    multi-deconv 64x64 fused loop) is OPT-IN like pallas_int8: auto
    never resolves to it until its on-chip gate + A/B pass (RESULTS.md
    records the decision; scripts/fused_projection_v4_exp.py).
    """
    from defensegan_tpu.kernels import (dense_kernel_available,
                                        s2d_kernel_available,
                                        v4_kernel_available)
    cfg = gan.cfg
    if requested is None:
        requested = cfg.projection_kernel
    if on_tpu is None:
        on_tpu = jax.default_backend() in ("tpu", "axon")
    # per-topology best XLA path (RESULTS.md): the BN-folded packed
    # generator wins only for the single-deconv wide arch (MNIST family);
    # multi-deconv stacks (deep, and wide 64x64) are conv-FLOP-dominated
    # where XLA's native conv scheduling wins (celeba 423 xla vs 415
    # packed; imagenet64 202 vs 156)
    xla_best = "packed" if len(gan.generator.channels) == 1 else "xla"
    kernel = requested
    if kernel == "auto":
        # measured on the v5e (RESULTS.md round 2): the fused bf16 Pallas
        # kernels win outright (wide v2 3676 vs 2570 xla; deep v3 1131 vs
        # 896 xla). int8 (v2i, 5757) is deliberately OPT-IN, not auto
        # (round-2 advisor): its defense-quality gate ran on the shipped
        # flagship checkpoint only, and quantization error is model- and
        # data-dependent — request projection_kernel=pallas_int8 explicitly
        # (bench.py does, after the gate) to claim the 1.53x.
        kernel = "pallas" if (on_tpu and not back_prop) else xla_best
    if kernel in ("pallas", "pallas_int8", "pallas_v4"):
        if back_prop or not on_tpu:
            # no Mosaic off-TPU; attack graphs need the differentiable path
            return xla_best
        if kernel == "pallas_v4":
            from defensegan_tpu.kernels.fused_projection_v4 import \
                v4_tile_for
            if v4_kernel_available(gan) and n % v4_tile_for(gan) == 0:
                return kernel
            return xla_best
        if dense_kernel_available(gan) and n % 256 == 0:
            return kernel
        if s2d_kernel_available(gan) and n % 64 == 0:
            return "pallas"  # deep topologies: bf16 v3 only (int8 v3 was
            # measured slower and cut — RESULTS.md round 2)
        return xla_best
    return kernel


class DefenseGAN:
    """WGAN + Defense-GAN projection for one dataset config."""

    def __init__(self, cfg: Config, key: Optional[jax.Array] = None):
        self.cfg = cfg
        dtype = _dtype_of(cfg.compute_dtype)
        self.generator = generator_for(cfg.type, cfg.gen_dim, dtype=dtype,
                                       arch=cfg.gen_arch)
        self.critic = critic_for(cfg.type, cfg.disc_dim, dtype=dtype)
        self.gen_tx, self.disc_tx = build_optimizers(
            cfg.gen_learning_rate, cfg.disc_learning_rate, cfg.beta1,
            cfg.beta2)
        key = key if key is not None else jax.random.key(cfg.seed)
        self.state: GANState = init_gan_state(
            self.generator, self.critic, key, cfg.image_shape,
            cfg.latent_dim, self.gen_tx, self.disc_tx)
        self._train_step = None
        self._train_chunk = None
        self._reconstructors: Dict[Tuple, callable] = {}
        self._sampler = None
        self.encoder = None          # amortized-inversion E (lazy-built)
        self.enc_params = None
        self._encode_fn = None

    # ------------------------------------------------------------------ gen
    def gen_apply_tanh(self, z: jnp.ndarray) -> jnp.ndarray:
        """Frozen generator in inference mode (BN running averages)."""
        return self.generator.apply(
            {"params": self.state.gen_params,
             "batch_stats": self.state.gen_stats}, z, train=False)

    def generate(self, key: jax.Array, n: int) -> jnp.ndarray:
        """Sample n images in [0, 1] (reference: generate_image)."""
        if self._sampler is None:
            @jax.jit
            def sampler(gen_params, gen_stats, z):
                out = self.generator.apply(
                    {"params": gen_params, "batch_stats": gen_stats}, z,
                    train=False)
                return to_image_space(out)
            self._sampler = sampler
        z = jax.random.normal(key, (n, self.cfg.latent_dim), jnp.float32)
        return self._sampler(self.state.gen_params, self.state.gen_stats, z)

    # -------------------------------------------------------------- encoder
    @property
    def encoder_dir(self) -> str:
        return os.path.join(self.cfg.output_dir, "encoder")

    def _build_encoder(self):
        if self.encoder is None:
            from defensegan_tpu.models.encoder import encoder_for
            self.encoder = encoder_for(
                self.cfg.type, self.cfg.disc_dim,
                z_dim=self.cfg.latent_dim,
                dtype=_dtype_of(self.cfg.compute_dtype))
        return self.encoder

    def train_encoder(self, images: np.ndarray, *,
                      iters: Optional[int] = None,
                      key: Optional[jax.Array] = None,
                      quiet: bool = False, **kw) -> Dict[str, float]:
        """Train the amortized-inversion encoder E(x) -> z against the
        FROZEN current generator and checkpoint it under
        <output_dir>/encoder/ (defense/encoder_init.py; NOT in the
        reference — enables rec_init="encoder"/"encoder_jitter").

        The encoder inverts THIS generator: retraining the GAN stales it
        (the checkpoint is stamped with the generator step it was trained
        against) — re-run train_encoder after gan.train()/load().
        """
        from defensegan_tpu.defense.encoder_init import train_encoder
        cfg = self.cfg
        enc = self._build_encoder()
        key = key if key is not None else jax.random.key(cfg.seed + 2)
        params, metrics = train_encoder(
            enc, self.gen_apply_tanh, images, key,
            iters=iters if iters is not None else cfg.encoder_train_iters,
            batch_size=kw.pop("batch_size", cfg.encoder_batch),
            lr=kw.pop("lr", cfg.encoder_lr),
            beta_z=kw.pop("beta_z", cfg.encoder_beta_z),
            noise_aug=kw.pop("noise_aug", cfg.encoder_noise_aug),
            quiet=quiet, **kw)
        self.enc_params = params
        self._encode_fn = None
        save_checkpoint(self.encoder_dir, int(self.state.step), params)
        return metrics

    def has_encoder(self) -> bool:
        return (self.enc_params is not None
                or latest_step(self.encoder_dir) is not None)

    def load_encoder(self, step: Optional[int] = None) -> "DefenseGAN":
        """Restore the encoder trained against this run's generator.

        step defaults to the latest encoder checkpoint; the step number
        is the GENERATOR step the encoder was trained against, so a
        mismatch with the loaded GAN checkpoint means a stale encoder."""
        enc = self._build_encoder()
        abstract = enc.init(
            jax.random.key(0),
            jnp.zeros((1,) + tuple(self.cfg.image_shape),
                      jnp.float32))["params"]
        self.enc_params = restore_checkpoint(self.encoder_dir, abstract,
                                             step)
        self._encode_fn = None
        return self

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        """E(x) -> z [B, k]; x in [0, 1] image space."""
        if self.enc_params is None:
            self.load_encoder()
        if self._encode_fn is None:
            from defensegan_tpu.models.generator import from_image_space
            encoder = self._build_encoder()

            @jax.jit
            def enc(params, x):
                return encoder.apply({"params": params},
                                     from_image_space(x))
            self._encode_fn = enc
        return self._encode_fn(self.enc_params, x)

    def _encoder_z0(self, x: jnp.ndarray, key: jax.Array, rr: int,
                    mode: str) -> jnp.ndarray:
        """[B, R, k] init latents from the encoder z0 policy (cached
        jitted program per (mode, R); enc_params passed as an argument so
        nothing captures stale weights)."""
        if self.enc_params is None:
            if latest_step(self.encoder_dir) is None:
                raise RuntimeError(
                    f"rec_init={mode!r} needs a trained encoder under "
                    f"{self.encoder_dir} — run train_encoder() first "
                    f"(or train.py --train_encoder)")
            self.load_encoder()
        sigma = self.cfg.encoder_sigma
        sig = ("enc-z0", mode, rr, sigma)
        if sig not in self._reconstructors:
            from defensegan_tpu.defense.encoder_init import encoder_z0
            encoder = self._build_encoder()

            @jax.jit
            def build(enc_params, x, key):
                def enc_apply(x_tanh):
                    return encoder.apply({"params": enc_params}, x_tanh)
                return encoder_z0(enc_apply, x, key, rec_rr=rr, mode=mode,
                                  sigma=sigma)
            self._reconstructors[sig] = build
        return self._reconstructors[sig](self.enc_params, x, key)

    # -------------------------------------------------------------- defense
    def reconstruct(self, x: jnp.ndarray, key: Optional[jax.Array] = None,
                    *, rec_rr: Optional[int] = None,
                    rec_iters: Optional[int] = None,
                    rec_lr: Optional[float] = None,
                    back_prop: bool = False,
                    kernel: Optional[str] = None,
                    init: Optional[str] = None) -> ReconstructionResult:
        """Project x (in [0,1]) onto the generator manifold.

        Reference: models/gan.py::reconstruct(x, batch_size, back_prop,
        reconstructor_id); compiled programs are cached per (shape, R, L, lr,
        back_prop) — the role reconstructor_id played in TF1.

        kernel overrides cfg.projection_kernel for this call (still routed
        through resolve_projection_kernel's runnability guards). kernel="xla"
        is the generic differentiable path — numerically identical to an
        attack graph built on defense.reconstruct directly, which is what
        --eval_z0 both uses to replay the attack's trajectory exactly.

        init overrides cfg.rec_init: "random" (reference N(0, I) restarts)
        | "encoder" | "encoder_jitter" (amortized-inversion init,
        defense/encoder_init.py — needs a trained encoder). The projection
        itself is identical under every init; only z0 changes.
        """
        cfg = self.cfg
        rr = rec_rr if rec_rr is not None else cfg.rec_rr
        iters = rec_iters if rec_iters is not None else cfg.rec_iters
        lr = rec_lr if rec_lr is not None else cfg.rec_lr
        key = key if key is not None else jax.random.key(cfg.seed + 1)

        # dispatch: resolve_projection_kernel (module level, shared with
        # bench.py) guarantees the returned pallas values are runnable for
        # this (topology, batch*rr, back_prop, backend) and degrades every
        # guard failure to the per-arch best XLA path
        init = init if init is not None else cfg.rec_init
        if init not in ("random", "encoder", "encoder_jitter"):
            raise ValueError(f"unknown rec_init {init!r}")

        kernel = resolve_projection_kernel(self, n=x.shape[0] * rr,
                                           back_prop=back_prop,
                                           requested=kernel)
        fn, mode = self._reconstructor_for(kernel, rr, iters, lr, back_prop)
        if init == "random":
            if mode == "xk":
                return fn(x, key)
            z0 = sample_z0(key, x.shape[0], rr, cfg.latent_dim)
        else:
            z0 = self._encoder_z0(x, key, rr, init)
            if mode == "xk":
                return fn(x, key, z0)
        if mode == "xz":
            return fn(x, z0)
        return fn(self.state.gen_params, self.state.gen_stats, x, z0)

    def _reconstructor_for(self, kernel: str, rr: int, iters: int,
                           lr: float, back_prop: bool):
        """Build (or fetch from cache) the projection program for a
        RESOLVED kernel; returns (fn, mode) where mode says how to call:
        "xk" -> fn(x, key); "xz" -> fn(x, z0); "pxz" -> fn(params, stats,
        x, z0).

        Builders pack concrete weights via numerical probes and host
        conversions (np.asarray), so they MUST run outside any trace.
        Callers that trace over this gan (parallel/serving.py's shard_map
        body) call this eagerly first to warm the cache — a cold build
        inside the trace is a TracerArrayConversionError on the real
        chip (round-4 serving_ab_sharded leg).
        """
        cfg = self.cfg
        if kernel == "pallas_v4":
            from defensegan_tpu.kernels import make_v4_reconstructor
            from defensegan_tpu.kernels.fused_projection_v4 import \
                v4_tile_for
            sig = ("pallas-v4", rr, iters, lr)
            if sig not in self._reconstructors:
                self._reconstructors[sig] = make_v4_reconstructor(
                    self, rec_rr=rr, rec_iters=iters, rec_lr=lr,
                    momentum=cfg.rec_momentum, tile=v4_tile_for(self))
            return self._reconstructors[sig], "xk"

        if kernel in ("pallas", "pallas_int8"):
            from defensegan_tpu.kernels import (
                dense_kernel_available,
                make_pallas_dense_int8_reconstructor,
                make_pallas_dense_reconstructor,
                make_pallas_s2d_reconstructor)
            if dense_kernel_available(self):
                int8 = kernel == "pallas_int8"
                sig = ("pallas-v2i" if int8 else "pallas-v2", rr, iters, lr)
                if sig not in self._reconstructors:
                    make = (make_pallas_dense_int8_reconstructor if int8
                            else make_pallas_dense_reconstructor)
                    self._reconstructors[sig] = make(
                        self, rec_rr=rr, rec_iters=iters, rec_lr=lr,
                        momentum=cfg.rec_momentum, tile=256)
                return self._reconstructors[sig], "xk"
            sig = ("pallas-v3", rr, iters, lr)
            if sig not in self._reconstructors:
                self._reconstructors[sig] = \
                    make_pallas_s2d_reconstructor(
                        self, rec_rr=rr, rec_iters=iters, rec_lr=lr,
                        momentum=cfg.rec_momentum, tile=64)
            return self._reconstructors[sig], "xk"

        if kernel == "packed":
            # BN-folded packed generator on the FLAT image space
            # (defense/fastgen.py): fewer ops for XLA to schedule, no
            # reshapes in the hot loop; weights are captured at build time
            # (caches cleared on train/load). For s2d the loop runs in
            # space-to-depth pixel order (MSE is permutation-invariant) and
            # the un-shuffle costs one gather outside the loop.
            variant = cfg.packed_variant
            if variant == "auto":
                variant = ("conv" if cfg.gen_arch == "wide"
                           else "s2d" if len(self.generator.channels) == 2
                           else "conv")
            sig = ("packed", variant, rr, iters, lr, back_prop)
            if sig not in self._reconstructors:
                from defensegan_tpu.defense.fastgen import (make_packed_apply,
                                                            pack_generator)
                packed = pack_generator(self.generator,
                                        self.state.gen_params,
                                        self.state.gen_stats,
                                        variant=variant)
                apply_flat = make_packed_apply(packed)
                perm = packed.perm
                img_shape = cfg.image_shape

                @jax.jit
                def run(x, z0):
                    x_flat = x.reshape(x.shape[0], -1)
                    if perm:
                        x_flat = x_flat[:, perm[0]]
                    res = reconstruct(apply_flat, x_flat, z0,
                                      rec_iters=iters, rec_lr=lr,
                                      momentum=cfg.rec_momentum,
                                      back_prop=back_prop,
                                      unroll=cfg.rec_unroll)
                    x_hat = res.x_hat
                    if perm:
                        x_hat = x_hat[:, perm[1]]
                    return res._replace(x_hat=x_hat.reshape(
                        (x.shape[0],) + tuple(img_shape)))
                self._reconstructors[sig] = run
            return self._reconstructors[sig], "xz"

        sig = (rr, iters, lr, back_prop)
        if sig not in self._reconstructors:
            def run(gen_params, gen_stats, x, z0):
                def gen_apply(z):
                    return self.generator.apply(
                        {"params": gen_params, "batch_stats": gen_stats}, z,
                        train=False)
                return reconstruct(gen_apply, x, z0, rec_iters=iters,
                                   rec_lr=lr, momentum=cfg.rec_momentum,
                                   back_prop=back_prop,
                                   unroll=cfg.rec_unroll)
            self._reconstructors[sig] = jax.jit(run)
        return self._reconstructors[sig], "pxz"

    # ------------------------------------------------------------- training
    def train(self, images: np.ndarray, *, mesh=None,
              train_iters: Optional[int] = None, log_every: int = 100,
              quiet: bool = False,
              on_divergence: str = "restore") -> Dict[str, float]:
        """Train the WGAN (reference: gan.train()).

        images: [N, H, W, C] float32 in [0, 1]. TPU-first data path: the
        whole dataset is placed on-device ONCE and minibatches are sampled
        inside the jitted step — the host sends only a PRNG key per cycle
        (the reference feeds numpy per sess.run, SURVEY.md section 3.1).
        Saves checkpoints + sample grids under cfg.output_dir, plus JSONL
        metrics (new vs reference).

        on_divergence (failure detection — the reference has none,
        SURVEY.md section 5): when a logged metric goes non-finite,
        "restore" reloads the latest checkpoint and continues with a fresh
        RNG stream; "raise" raises RuntimeError.
        """
        cfg = self.cfg
        iters = train_iters if train_iters is not None else cfg.train_iters
        if mesh is None and len(jax.devices()) > 1:
            mesh = make_mesh()
        if self._train_step is None:
            step = make_data_train_step(
                self.generator, self.critic, self.gen_tx, self.disc_tx,
                latent_dim=cfg.latent_dim, batch_size=cfg.batch_size,
                disc_iters=cfg.disc_iters, gp_lambda=cfg.gp_lambda)
            self._train_step = jax.jit(
                lambda state, data, key: step(state, data, key, mesh=mesh))

        if self._train_chunk is None:
            # N steps inside ONE program (lax.scan over fresh PRNG keys):
            # the host fetches metrics once per chunk instead of
            # round-tripping state handles every step — significant on
            # transports with per-dispatch overhead (see CLAUDE.md).
            # Late-binds self._train_step so tests can substitute it.
            def chunk(state, data, key, n):
                keys = jax.random.split(key, n)

                def body(st, k):
                    return self._train_step(st, data, k)

                st, ms = jax.lax.scan(body, state, keys)
                return st, {k: v[-1] for k, v in ms.items()}

            self._train_chunk = jax.jit(chunk, static_argnums=3)

        ensure_dir(cfg.output_dir)
        save_config(cfg)
        key = jax.random.key(cfg.seed)
        key, sample_key = jax.random.split(key)
        # uint8 datasets stay uint8 on device (normalized per minibatch
        # inside the step); everything else is float32 in [0, 1]
        data = jnp.asarray(images) if images.dtype == np.uint8 \
            else jnp.asarray(images, jnp.float32)
        if mesh is not None:
            from defensegan_tpu.parallel import replicated_sharding
            data = jax.device_put(data, replicated_sharding(mesh))
            self.state = jax.device_put(self.state, replicated_sharding(mesh))
        metrics = {}
        last_good = {}
        t0 = time.time()
        state = self.state

        def _next_boundary(it):
            """Steps until the next log/sample/save/end event."""
            nxt = iters
            for every in (log_every, cfg.sample_every, cfg.save_every):
                if every and every > 0:
                    nxt = min(nxt, (it // every + 1) * every)
            return max(nxt - it, 1)

        it = 0
        while it < iters:
            n = _next_boundary(it)
            key, step_key = jax.random.split(key)
            if n == 1:
                state, metrics = self._train_step(state, data, step_key)
            else:
                state, metrics = self._train_chunk(state, data, step_key, n)
            it += n
            # Divergence check at EVERY boundary (metrics are fetched per
            # chunk), not only log boundaries — otherwise a NaN state
            # reached in a chunk ending on a save-only boundary would be
            # checkpointed below and then re-restored forever.
            m = {k: float(v) for k, v in metrics.items()}
            if not all(np.isfinite(v) for v in m.values()):
                if on_divergence == "restore" and latest_step(
                        cfg.output_dir) is not None:
                    print(f"[{cfg.type}] step {it}: non-finite metrics "
                          f"{m}; restoring latest checkpoint")
                    state = restore_checkpoint(cfg.output_dir,
                                               self.state)
                    key = jax.random.fold_in(key, it)
                    # return value must not carry the diverged metrics;
                    # fall back to the last finite logged ones (and let
                    # the sample/save blocks below still run on the
                    # restored state — matters when it == iters)
                    metrics = dict(last_good)
                else:
                    raise RuntimeError(
                        f"training diverged at step {it}: {m}")
            elif it % log_every == 0 or it == iters:
                last_good = m
                m = dict(m, step=it,
                         wall_s=round(time.time() - t0, 2))
                append_jsonl(
                    os.path.join(cfg.output_dir, "metrics.jsonl"), m)
                if not quiet:
                    print(f"[{cfg.type}] step {it}/{iters} "
                          f"w={m.get('wasserstein', 0):+.4f} "
                          f"g={m.get('g_loss', 0):+.4f} "
                          f"gp={m.get('gp', 0):.4f}")
            if it % cfg.sample_every == 0 or it == iters:
                self.state = state
                grid = self.generate(sample_key, 64)
                save_images(np.asarray(grid),
                            os.path.join(cfg.output_dir, "samples",
                                         f"sample_{it:07d}.png"))
            if it % cfg.save_every == 0 or it == iters:
                self.state = state
                self.save()
        self.state = state
        # pallas reconstructors capture packed weights at build time —
        # invalidate them now that the generator changed (the XLA ones take
        # params as arguments and could stay, but a full clear is cheap)
        self._reconstructors.clear()
        out = {k: float(v) for k, v in metrics.items()}
        wall = time.time() - t0
        if wall > 0:
            out["train_steps_per_s"] = round(iters / wall, 2)
            if not quiet:
                print(f"[{cfg.type}] {iters} steps in {wall:.1f}s "
                      f"({out['train_steps_per_s']} generator steps/s)")
        return out

    # ------------------------------------------------------------ ckpt i/o
    def save(self) -> str:
        """Checkpoint params/opt-state (reference: base_model.save)."""
        save_config(self.cfg)
        return save_checkpoint(self.cfg.output_dir,
                               int(self.state.step), self.state)

    def load(self, step: Optional[int] = None) -> "DefenseGAN":
        """Restore the latest (or given) checkpoint (reference: load())."""
        self.state = restore_checkpoint(self.cfg.output_dir, self.state, step)
        self._reconstructors.clear()  # drop weight-capturing caches
        return self

    def can_load(self) -> bool:
        return latest_step(self.cfg.output_dir) is not None
