"""Multi-chip defended SERVING: the projection sharded over a device mesh.

New TPU-native machinery — the reference (kabkabm/defensegan) is
single-GPU with no serving surface at all. The projection defense is
embarrassingly parallel over the image batch: restarts live INSIDE each
image's shard and the per-image argmin over R never crosses devices
(parallel/mesh.py::validate_projection_sharding). Serving at pod scale is
therefore pure data parallelism with ZERO collectives: `jax.shard_map`
runs the single-chip projection — including the fused Pallas kernels,
which compose with shard_map by executing on each device's local block —
over the batch shards, and results come back sharded on the same axis.

`ShardedDefenseGAN` duck-types `DefenseGAN.reconstruct`, so every
defended consumer (eval/accuracy.py::batched_reconstruct,
eval/detect.py, defense/pipeline.py::DefendedPipeline) runs multi-chip
unchanged:

    mesh = make_mesh()
    pipe = DefendedPipeline(ShardedDefenseGAN(gan, mesh), logits_fn)
    pipe.calibrate(x_clean).predict(x)      # projection sharded over ICI

Restart-init keys: each device folds its mesh position into the call key
(`fold_in(key, axis_index)`), so shards draw independent z0 — the
multi-chip run at batch B matches single-chip runs of each shard with the
corresponding folded key exactly (tested), and two different mesh sizes
give different (equally valid) stochastic draws, same as any other key
layout change.

Attack graphs (back_prop=True) are out of scope here by design: they
need gradients THROUGH the projection, which this wrapper's shard_map
does not expose — build those on the single-chip DefenseGAN (GSPMD
shards the attack program when inputs carry a batch sharding; see
tests/test_parallel.py).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from defensegan_tpu.parallel.mesh import (DATA_AXIS, make_mesh,
                                          validate_projection_sharding)


class ShardedDefenseGAN:
    """Data-parallel serving wrapper over a trained DefenseGAN.

    Same `reconstruct` contract as DefenseGAN (minus back_prop); programs
    are cached per (global batch, overrides) like the single-chip cache.
    """

    def __init__(self, gan, mesh: Optional[Mesh] = None):
        self.gan = gan
        self.mesh = mesh if mesh is not None else make_mesh()
        self._cache: Dict[Tuple, callable] = {}
        # the shard_map trace bakes gan.state's weights into the compiled
        # program as constants; gan.load()/train() rebind gan.state (and
        # clear gan's own caches), so track the traced state's identity
        # and drop our programs when it changes — otherwise we'd silently
        # serve reconstructions from stale weights
        self._traced_state = gan.state

    # duck-typed surface consumers touch (resolve_projection_kernel,
    # batched_reconstruct's overrides, classifier tags)
    @property
    def cfg(self):
        return self.gan.cfg

    @property
    def generator(self):
        return self.gan.generator

    @property
    def state(self):
        return self.gan.state

    def reconstruct(self, x: jnp.ndarray, key: Optional[jax.Array] = None,
                    *, rec_rr: Optional[int] = None,
                    rec_iters: Optional[int] = None,
                    rec_lr: Optional[float] = None,
                    back_prop: bool = False,
                    kernel: Optional[str] = None,
                    init: Optional[str] = None):
        if back_prop:
            raise ValueError(
                "ShardedDefenseGAN is the serving path (no gradients "
                "through shard_map exposed); build attack graphs on the "
                "single-chip DefenseGAN — GSPMD shards those when inputs "
                "carry a batch sharding")
        from defensegan_tpu.gan.defense_gan import resolve_projection_kernel

        cfg = self.gan.cfg
        rr = rec_rr if rec_rr is not None else cfg.rec_rr
        iters = rec_iters if rec_iters is not None else cfg.rec_iters
        lr = rec_lr if rec_lr is not None else cfg.rec_lr
        key = key if key is not None else jax.random.key(cfg.seed + 1)
        validate_projection_sharding(self.mesh, x.shape[0], rr)
        # resolve the kernel against the PER-SHARD flat batch (each device
        # runs the guards on its local block) and normalize the cache key to
        # resolved values — None vs explicit-cfg-equal overrides, or 'auto'
        # vs its resolution, must not compile duplicate programs (Mosaic
        # compiles are minutes each on the remote TPU compiler)
        n_local = (x.shape[0] // self.mesh.devices.size) * rr
        kernel = resolve_projection_kernel(self.gan, n=n_local,
                                           requested=kernel)

        if self._traced_state is not self.gan.state:
            self._cache.clear()
            self._traced_state = self.gan.state
        init = init if init is not None else cfg.rec_init
        if init != "random" and self.gan.enc_params is None:
            # load OUTSIDE the shard_map trace (orbax restore is host IO);
            # the encoder params enter the traced program as constants,
            # i.e. replicated — correct for data-parallel serving
            self.gan.load_encoder()
        sig = (x.shape[0], rr, iters, lr, kernel, init)
        if sig not in self._cache:
            gan = self.gan
            # build the single-chip program EAGERLY, before the shard_map
            # trace: kernel/packed builders extract concrete weights via
            # numerical probes + np.asarray, which is a
            # TracerArrayConversionError if the first build happens inside
            # the traced body (hit on the real chip, round-4
            # serving_ab_sharded — the CPU tests masked it because their
            # exact-match control had already warmed the same cache)
            gan._reconstructor_for(kernel, rr, iters, lr, False)

            def local(xb, k):
                kb = jax.random.fold_in(k, jax.lax.axis_index(DATA_AXIS))
                return gan.reconstruct(xb, kb, rec_rr=rr, rec_iters=iters,
                                       rec_lr=lr, kernel=kernel, init=init)

            fn = jax.shard_map(local, mesh=self.mesh,
                               in_specs=(P(DATA_AXIS), P()),
                               out_specs=P(DATA_AXIS),
                               check_vma=False)  # per-device keys are
            # deliberately device-varying (fold_in of axis_index)
            self._cache[sig] = jax.jit(fn)
        return self._cache[sig](jnp.asarray(x), key)
