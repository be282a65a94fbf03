"""Batched, jitted, mesh-sharded training (reference train.py rebuilt).

One fused train step replaces the reference's per-sample Python pipeline
(reference train.py:144-181: three nested host loops + 3 separate Adam
steps). Differences, all deliberate and documented:

* one optax optimizer over the full parameter pytree instead of three Adams —
  Adam is per-parameter, so partitioning parameters across optimizers is
  mathematically identical (reference train.py:265-267);
* objective = mean over batch of per-sample summed CE (the reference backprops
  per-sample sums one at a time; batching averages their gradients);
* validation = greedy-fed decode loss + BLEU, exactly the reference's
  ``validate`` semantics (train.py:61-129: argmax feeding, loss over
  ``target_len`` steps, stats divided per-sample by target_len);
* checkpoints carry optimizer state -> training is resumable (new capability;
  the reference could only save, train.py:197-214).
"""

from __future__ import annotations

import json
import signal
import threading
import time
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax

from mmqg_tpu import checkpoint as ckpt
from mmqg_tpu import metrics as M
from mmqg_tpu.data.dataset import Batch, QGDataset
from mmqg_tpu.data.vocab import END_ID, PAD_ID, START_ID
from mmqg_tpu.models import decoder as D
from mmqg_tpu.models import qg_model


def learning_rate_schedule(config):
    """Learning-rate schedule from config: ``lr_schedule`` in
    {"constant", "cosine", "linear"} with ``lr_warmup_steps`` linear warmup
    from 0 and, for the decaying shapes, a ``lr_decay_steps`` horizon
    (total optimizer updates, warmup included) down to
    ``lr * lr_min_ratio``. Returns a float for the plain constant case so
    the optimizer state stays identical to the reference's fixed-lr Adam
    (reference train.py:264: Adam(lr=1e-4), no schedule — these knobs are
    production capability on top)."""
    lr = config.lr
    sched = getattr(config, "lr_schedule", "constant")
    warmup = int(getattr(config, "lr_warmup_steps", 0) or 0)
    decay = int(getattr(config, "lr_decay_steps", 0) or 0)
    ratio = float(getattr(config, "lr_min_ratio", 0.0) or 0.0)
    end = lr * ratio
    if sched == "constant":
        if decay or ratio:
            # loud error, not a silent no-op: decay knobs without a decaying
            # schedule means the user almost certainly forgot lr_schedule
            raise ValueError(
                f"lr_decay_steps={decay}/lr_min_ratio={ratio} are set but "
                f"lr_schedule is 'constant' — set lr_schedule to 'cosine' "
                f"or 'linear' (or clear the decay knobs)")
        if not warmup:
            return lr
        return optax.join_schedules(
            [optax.linear_schedule(0.0, lr, warmup),
             optax.constant_schedule(lr)], [warmup])
    if sched not in ("cosine", "linear"):
        raise ValueError(f"unknown lr_schedule: {sched}")
    if decay <= warmup:
        raise ValueError(
            f"lr_schedule={sched!r} needs lr_decay_steps (total optimizer "
            f"updates, > lr_warmup_steps); got decay={decay}, "
            f"warmup={warmup}")
    if sched == "cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, lr, warmup, decay, end_value=end)
    return optax.join_schedules(
        [optax.linear_schedule(0.0, lr, warmup),
         optax.linear_schedule(lr, end, decay - warmup)], [warmup])


def make_optimizer(config) -> optax.GradientTransformation:
    """adam/adamw/sgd per config.optim (reference config.py:64) with the
    optional lr schedule (``learning_rate_schedule``), decoupled weight
    decay (``weight_decay`` > 0 turns adam into adamw), and optional clip.

    ``text_non_trainable=True`` freezes the GloVe embedding table (the
    reference declares the same flag at config.py:82 but hardcodes False at
    its create_emb_layer call, train.py:236 — here the knob works). Frozen
    = zeroed updates via optax.masked, so the table stays bit-identical to
    the loaded weight matrix (weight decay included: the freeze zeroes the
    whole update after it is formed)."""
    lr = learning_rate_schedule(config)
    wd = float(getattr(config, "weight_decay", 0.0) or 0.0)
    if config.optim == "adam":
        if wd > 0:
            # decay only weight MATRICES (ndim >= 2): biases and BatchNorm
            # scale/shift must not be pulled toward zero — the standard
            # AdamW masking (what torch param groups do)
            opt = optax.adamw(
                lr, weight_decay=wd,
                mask=lambda params: jax.tree.map(
                    lambda p: hasattr(p, "ndim") and p.ndim >= 2, params))
        else:
            opt = optax.adam(lr)
    elif config.optim == "sgd":
        if wd > 0:
            raise ValueError(
                "weight_decay is only implemented for optim='adam' "
                "(decoupled adamw); got optim='sgd' — a silently ignored "
                "knob would change the training the user asked for")
        opt = optax.sgd(lr)
    else:
        raise ValueError(f"unknown optim: {config.optim}")
    if config.grad_clip_norm and config.grad_clip_norm > 0:
        opt = optax.chain(optax.clip_by_global_norm(config.grad_clip_norm), opt)
    if getattr(config, "text_non_trainable", False):
        def labels(params):
            return jax.tree_util.tree_map_with_path(
                lambda path, _: ("freeze"
                                 if getattr(path[0], "key", None)
                                 == "embedding" else "train"),
                params)
        opt = optax.multi_transform(
            {"train": opt, "freeze": optax.set_to_zero()}, labels)
    return opt


def init_train_state(rng, mc: qg_model.ModelConfig, emb_weights,
                     optimizer) -> Dict[str, Any]:
    params, model_state = qg_model.init(rng, mc, emb_weights)
    return {
        "params": params,
        "model_state": model_state,
        "opt_state": optimizer.init(params),
        "step": jnp.zeros((), jnp.int32),
    }


def batch_arrays(batch: Batch) -> Dict[str, np.ndarray]:
    """Device-bound view of a Batch (drops host-only fields)."""
    return {
        "context_ids": batch.context_ids,
        "context_len": batch.context_len,
        "frames": batch.frames,
        "frames_len": batch.frames_len,
        "audio_pcm": batch.audio_pcm,
        "audio_len": batch.audio_len,
        "target_ids": batch.target_ids,
        "target_len": batch.target_len,
        "valid": batch.valid,
    }


def make_train_step(mc: qg_model.ModelConfig, optimizer, *,
                    dtype=jnp.bfloat16,
                    audio_cap=None, frames_cap=None, accum_steps: int = 1,
                    donate: bool = True, sp_mesh=None,
                    sp_gather_free: bool = False,
                    state_shardings: Optional[Dict[str, Any]] = None):
    """``audio_cap``/``frames_cap``: static AV-length buckets (see
    qg_model.loss_fn) — the encoders skip guaranteed-padding slots whose
    gradients are identically zero. One compiled variant per bucket pair.

    ``donate``: donate the train-state buffers (halves peak state memory —
    old and new params/opt never coexist). Measured on the v5e backend
    (PERF.md "donation"): donation costs ~2x on a SMALL single step
    (B=32: 273 vs 128 ms — scheduling, not copies) but is free once the
    step is big or accumulated (B>=64 / any accum_steps>1, where turning
    it off instead triggers memory-pressure remat). Keep it on unless you
    run small-batch single steps with HBM to spare
    (``config.donate_buffers``).

    ``accum_steps``: gradient accumulation — the batch's leading dim splits
    into ``accum_steps`` microbatches scanned sequentially, gradients
    averaged with per-microbatch valid-sample weights, ONE optimizer update.
    Identical to the full-batch step wherever the model has no batch-stat
    coupling (exact in text mode, tested); with BatchNorm encoders the
    usual accumulation caveat applies (per-micro batch stats) — QUANTIFIED
    in tests/test_train.py::test_grad_accum_trimodal_bn_drift_bounded:
    ~1.9% relative update drift / ~5e-5 relative loss delta on the trimodal
    fixture (bounded <5% by the test), and running stats see one momentum
    update per microbatch
    (same fixed point, ~accum_steps× faster effective momentum — exactly
    what torch stepping per microbatch would do). Use when the
    full batch exceeds a compile/memory ceiling — this backend's remote
    compiler rejects the trimodal step at B=128, but B=64 x 2 accumulated
    compiles and runs (PERF.md training table)."""
    # training-side sequence parallelism: keep the context axis of the text
    # attention memory sharded over the model axis through the decode AND
    # its backward (config.sequence_parallel_train; see loss_fn docstring).
    # sp_gather_free additionally runs the attention itself as the explicit
    # distributed two-pass softmax (ops/attention_sp) instead of letting
    # GSPMD choose where to gather (config.sp_gather_free).
    mem_constraint, attn_fn = None, None
    if sp_mesh is not None:
        from mmqg_tpu.parallel.mesh import sequence_constraint
        mem_constraint = sequence_constraint(sp_mesh)
        if sp_gather_free:
            from mmqg_tpu.ops.attention_sp import trimodal_attention_sp
            attn_fn = partial(trimodal_attention_sp, mesh=sp_mesh)

    def grads_and_aux(params, model_state, mb, rng_):
        def lf(p):
            return qg_model.loss_fn(
                p, model_state, mc, mb, train=True,
                dropout_rng=rng_, dtype=dtype,
                audio_cap=audio_cap, frames_cap=frames_cap,
                mem_constraint=mem_constraint, attn_fn=attn_fn)
        return jax.value_and_grad(lf, has_aux=True)(params)

    def finish(train_state, grads, model_state, metrics):
        updates, opt_state = optimizer.update(
            grads, train_state["opt_state"], train_state["params"])
        params = optax.apply_updates(train_state["params"], updates)
        if state_shardings is not None:
            # ZeRO-1 (config.zero1; parallel/mesh.zero1_shardings): pin the
            # updated params back to the replicated/TP layout and the new
            # moments to their data-axis shards — GSPMD then reduce-scatters
            # the gradient into the update and all-gathers only the params,
            # instead of all-reducing the gradient onto every device
            params = lax.with_sharding_constraint(
                params, state_shardings["params"])
            opt_state = lax.with_sharding_constraint(
                opt_state, state_shardings["opt_state"])
        new_state = {
            "params": params,
            "model_state": model_state,
            "opt_state": opt_state,
            "step": train_state["step"] + 1,
        }
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    def train_step(train_state, batch, rng):
        (objective, aux), grads = grads_and_aux(
            train_state["params"], train_state["model_state"], batch, rng)
        return finish(train_state, grads, aux["state"], {
            "objective": objective,
            "loss": aux["loss_per_sample"],       # reference-style stat
            "loss_per_token": aux["loss_per_token"],
        })

    def train_step_accum(train_state, batch, rng):
        A = accum_steps

        def split(x):
            B = x.shape[0]
            if B % A:
                raise ValueError(f"batch {B} not divisible by "
                                 f"accum_steps {A}")
            return x.reshape((A, B // A) + x.shape[1:])

        micro = {k: split(v) for k, v in batch.items()}
        rngs = jax.random.split(rng, A)
        params = train_state["params"]
        g0 = jax.tree.map(jnp.zeros_like, params)
        z = jnp.zeros((), jnp.float32)
        init = (g0, train_state["model_state"], z, z, z, z, z)

        def body(carry, xs):
            g_acc, model_state, obj, loss, ce, ntok, n_acc = carry
            mb, r = xs
            (obj_i, aux), g = grads_and_aux(params, model_state, mb, r)
            # full-batch grad = sum_i n_i * g_i / sum_i n_i  (loss_fn
            # normalises each micro by its own valid count)
            n = mb["valid"].sum().astype(jnp.float32)
            g_acc = jax.tree.map(lambda a, b: a + n * b, g_acc, g)
            return (g_acc, aux["state"], obj + n * obj_i,
                    loss + n * aux["loss_per_sample"],
                    ce + aux["loss_per_token"] * aux["n_tokens"],
                    ntok + aux["n_tokens"], n_acc + n), None

        (g_acc, model_state, obj, loss, ce, ntok, n_acc), _ = lax.scan(
            body, init, (micro, rngs))
        n_acc = jnp.maximum(n_acc, 1.0)
        grads = jax.tree.map(lambda g: g / n_acc, g_acc)
        return finish(train_state, grads, model_state, {
            "objective": obj / n_acc,
            "loss": loss / n_acc,
            "loss_per_token": ce / jnp.maximum(ntok, 1),
        })

    fn = train_step if accum_steps == 1 else train_step_accum
    return jax.jit(fn, donate_argnums=(0,)) if donate else jax.jit(fn)


def make_validate_step(mc: qg_model.ModelConfig, *, use_pallas: bool = True,
                       dtype=jnp.bfloat16):
    """Greedy-fed validation decode (reference train.py:100-110): argmax
    feeding for ``target_steps`` steps, CE against the target at each step.
    Returns per-sample loss and the predicted tokens.

    Encode and the decode scan are separate jitted programs (see
    mmqg_tpu.decode.encode_jit for why)."""
    from mmqg_tpu.decode import encode_jit

    @jax.jit
    def greedy_ce_scan(params, mem, dec_state, target_ids, target_len):
        B, T = target_ids.shape
        emb_table = params["embedding"]["table"]
        av_vec = (qg_model.av_vector(mem) if mc.decoder == "non_attn"
                  else None)

        def body(carry, t):
            state, tok = carry
            if mc.decoder == "attn":
                logits, new_state, _ = D.step(
                    params["decoder"], emb_table, tok, mem, state,
                    train=False, use_pallas=use_pallas, dtype=dtype)
            else:
                logits, new_state = D.non_attn_step(
                    params["decoder"], emb_table, tok, av_vec, state,
                    train=False, dtype=dtype)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            tgt_t = target_ids[:, t]
            ce_t = -jnp.take_along_axis(logp, tgt_t[:, None], -1)[:, 0]
            nxt = jnp.argmax(logits, -1).astype(jnp.int32)
            return (new_state, nxt), (ce_t, nxt)

        init = (dec_state, jnp.full((B,), START_ID, jnp.int32))
        _, (ces, toks) = lax.scan(body, init, jnp.arange(T))
        ces = jnp.swapaxes(ces, 0, 1)           # (B, T)
        toks = jnp.swapaxes(toks, 0, 1)         # (B, T)
        step_mask = jnp.arange(T)[None, :] < target_len[:, None]
        per_sample = (ces * step_mask).sum(1) / jnp.maximum(target_len, 1)
        return per_sample, toks

    def validate_step(params, model_state, batch):
        mem, dec_state = encode_jit(params, model_state, mc, batch,
                                    use_pallas)
        return greedy_ce_scan(params, mem, dec_state, batch["target_ids"],
                              batch["target_len"])

    return validate_step


def evaluate_bleu(tokens: np.ndarray, questions, index_to_word,
                  valid: np.ndarray,
                  compat: bool = False) -> Tuple[Dict[str, float], int]:
    """Host-side BLEU suite over a batch of decoded tokens.
    Returns (per-metric averages, number of scored samples)."""
    from mmqg_tpu.decode import tokens_to_words

    sums = {k: 0.0 for k in M.BLEU_WEIGHTS}
    n = 0
    word_rows = tokens_to_words(np.asarray(tokens), index_to_word)
    for words, q, ok in zip(word_rows, questions, valid):
        if not ok:
            continue
        suite = M.bleu_suite(q, words, compat=compat)
        for k, v in suite.items():
            sums[k] += v
        n += 1
    return {k: v / max(n, 1) for k, v in sums.items()}, n


class Trainer:
    """Full training driver (reference train.py:220-297 main), batched."""

    def __init__(self, config, mc: qg_model.ModelConfig, emb_weights,
                 train_ds: QGDataset, val_ds: QGDataset,
                 *, use_pallas: Optional[bool] = None, log_fn=print,
                 mesh=None, profile_dir=None):
        self.config = config
        self.mc = mc
        self.use_pallas = (config.use_pallas if use_pallas is None else use_pallas)
        self.optimizer = make_optimizer(config)
        self.train_ds = train_ds
        self.val_ds = val_ds
        self.log = log_fn
        self.mesh = mesh
        self.profile_dir = profile_dir  # perfetto trace of one warm step
        self._profiled = False
        self._steps_used = set()        # step fns that have executed once
        self.accum_steps = getattr(config, "grad_accum_steps", 1) or 1
        self.donate = getattr(config, "donate_buffers", True)
        if mesh is not None and self.accum_steps > 1:
            dp = mesh.devices.shape[0]
            padded = -(-config.batch_size // dp) * dp
            if padded % self.accum_steps:
                raise ValueError(
                    f"batch_size {config.batch_size} pads to {padded} on the "
                    f"{dp}-way data axis, which is not divisible by "
                    f"grad_accum_steps {self.accum_steps}; pick batch_size "
                    f"so that its data-axis-padded size divides evenly")
        # training-side SP (config.sequence_parallel_train): only meaningful
        # with a model axis to shard the context over; silently a no-op
        # otherwise so one config can serve mesh and single-device runs
        self.sp_mesh = (mesh if getattr(config, "sequence_parallel_train",
                                        False)
                        and mesh is not None
                        and mesh.devices.shape[1] > 1 else None)
        self.sp_gather_free = (getattr(config, "sp_gather_free", False)
                               and self.sp_mesh is not None)
        # ZeRO-1 optimizer-state sharding (config.zero1) and FSDP/ZeRO-3
        # parameter sharding (config.fsdp — implies zero1 so the moment and
        # parameter shards align leaf-for-leaf): both need a data axis to
        # shard over; silently a no-op otherwise
        has_dp = mesh is not None and mesh.devices.shape[0] > 1
        self.fsdp = getattr(config, "fsdp", False) and has_dp
        self.zero1 = (getattr(config, "zero1", False) or self.fsdp) and has_dp
        rng = jax.random.PRNGKey(config.seed)
        self.rng, init_rng = jax.random.split(rng)
        self.train_state = init_train_state(init_rng, mc, emb_weights,
                                            self.optimizer)
        self._state_shardings = None
        if self.zero1:
            from mmqg_tpu.parallel.mesh import (fsdp_shardings,
                                                param_shardings,
                                                zero1_shardings)
            pshard = fsdp_shardings if self.fsdp else param_shardings
            self._state_shardings = {
                "params": pshard(self.train_state["params"], mesh),
                "opt_state": zero1_shardings(self.train_state["opt_state"],
                                             mesh),
            }
        if mesh is not None:
            self.train_state = self._place_on_mesh(self.train_state)
        self.train_step = make_train_step(mc, self.optimizer,
                                          accum_steps=self.accum_steps,
                                          donate=self.donate,
                                          sp_mesh=self.sp_mesh,
                                          sp_gather_free=self.sp_gather_free,
                                          state_shardings=self._state_shardings)
        # bucketed variants — skip padded AV slots in training just like
        # serving does; gradients are unchanged (loss_fn doc). Granularity is
        # shared with serving's decode._bucket; the measured A/B
        # (scripts/bench_train_buckets.py, PERF.md) puts eighths 8% faster
        # steady-state on the corpus span distribution at 2x the compile
        # count (break-even ~10k steps) — config.train_av_bucket_granularity
        # picks the point on that trade.
        self.av_bucketing = getattr(config, "train_av_bucketing", True)
        self.av_bucket_granularity = int(
            getattr(config, "train_av_bucket_granularity", 8))
        self._bucketed_steps = {}
        self.validate_step = make_validate_step(mc, use_pallas=self.use_pallas)
        # reference epoch_stats schema (train.py:132); bleu_4 is declared
        # but never populated THERE EITHER (its append is commented out at
        # reference train.py:195) — the empty series is faithful parity
        self.epoch_stats = {"train": {"loss": []},
                            "val": {"loss": [], "bleu": [], "bleu_1": [],
                                    "bleu_2": [], "bleu_3": [], "bleu_4": []}}
        self.best_val = float("inf")
        self.best_epoch = -1
        self.start_epoch = 0

    # --------------------------------------------------------- parallelism
    def _place_on_mesh(self, train_state) -> Dict[str, Any]:
        """Shard the train state over ``self.mesh`` (SURVEY.md §2 C26-C28):
        params/opt_state per the TP rules (pure-DP meshes replicate them),
        model_state and step replicated. Batches shard batch-over-data in
        ``run_epoch``/``validate``; XLA/GSPMD emits the grad psum over ICI.
        The ``_global`` placement helpers are identical single-process and
        assemble from per-process copies when the mesh spans hosts
        (parallel/multihost.py)."""
        from mmqg_tpu.parallel.multihost import (place_global,
                                                 replicate_global,
                                                 shard_params_global)

        if self.zero1:
            opt_state = place_global(train_state["opt_state"],
                                     self._state_shardings["opt_state"])
        else:
            opt_state = shard_params_global(train_state["opt_state"],
                                            self.mesh)
        if self.fsdp:
            params = place_global(train_state["params"],
                                  self._state_shardings["params"])
        else:
            params = shard_params_global(train_state["params"], self.mesh)
        return {
            "params": params,
            "model_state": replicate_global(train_state["model_state"],
                                            self.mesh),
            "opt_state": opt_state,
            "step": replicate_global(train_state["step"], self.mesh),
        }

    # ------------------------------------------------------------- epochs
    def _step_for(self, arrays) -> Any:
        """Pick (and cache) the train-step variant for this batch's AV
        buckets; falls back to the uncapped step for text-only mode or when
        bucketing is disabled."""
        if not self.av_bucketing or self.mc.mode == "text":
            return self.train_step
        from mmqg_tpu import decode as DEC

        av = self.mc.av_max_length
        g = self.av_bucket_granularity
        bucket = lambda need: DEC._bucket(  # noqa: E731
            min(max(need, 1), av), av, granularity=g)
        fneed = int(np.max(arrays["frames_len"]))
        aneed = (DEC.audio_examples_needed(self.mc, arrays["audio_len"])
                 if self.mc.mode == "trimodal" else None)
        if jax.process_count() > 1:
            # per-process sharded loaders only see their own rows' lengths;
            # the cap (a COMPILE decision) must match on every process or
            # their collectives diverge and the runtime deadlocks
            from mmqg_tpu.parallel.multihost import global_max_int
            fneed = global_max_int(fneed)
            if aneed is not None:
                aneed = global_max_int(aneed)
        fcap = bucket(fneed)
        acap = None if aneed is None else bucket(aneed)
        key = (acap, fcap)
        if key not in self._bucketed_steps:
            self._bucketed_steps[key] = make_train_step(
                self.mc, self.optimizer, audio_cap=acap, frames_cap=fcap,
                accum_steps=self.accum_steps, donate=self.donate,
                sp_mesh=self.sp_mesh,
                sp_gather_free=self.sp_gather_free,
                state_shardings=self._state_shardings)
        return self._bucketed_steps[key]

    def run_epoch(self, epoch: int) -> float:
        bs = self.config.batch_size
        total, n = 0.0, 0
        rng_np = np.random.default_rng(self.config.seed + epoch)
        # Deferred metric reads: float(loss) is a device->host sync — ~30 ms
        # round-trip per step on a remote-tunnel backend — that would
        # serialise host-side batch prep with device compute. Holding a
        # 2-step lag keeps the device queue fed (next batch packs + ships
        # while the device still runs) without queueing a whole epoch of
        # in-flight input buffers. Measured: PERF.md "Trainer epoch overhead".
        from collections import deque
        pending = deque()  # (device scalar, batch size)

        def drain(k: int):
            nonlocal total, n
            while len(pending) > k:
                loss, size = pending.popleft()
                total += float(loss) * size
                n += size

        for i, batch in enumerate(
                self.train_ds.batches(bs, shuffle=True, rng=rng_np)):
            self.rng, step_rng = jax.random.split(self.rng)
            arrays = batch_arrays(batch)
            step_fn = self._step_for(arrays)  # buckets from HOST arrays
            if self.mesh is not None:
                from mmqg_tpu.parallel import pad_and_shard_batch
                arrays = pad_and_shard_batch(arrays, self.mesh)
            # profile the first batch whose step variant has ALREADY run
            # once (so the trace captures a warm step, not a compile — with
            # AV bucketing batch i=1 may hit a fresh bucket variant)
            if (self.profile_dir and not self._profiled
                    and id(step_fn) in self._steps_used):
                from mmqg_tpu.utils import profiling
                drain(0)  # the trace must capture one step, not the backlog
                with profiling.trace(self.profile_dir):
                    with profiling.annotate("train_step"):
                        self.train_state, metrics = step_fn(
                            self.train_state, arrays, step_rng)
                        np.asarray(metrics["loss"])  # sync inside the trace
                self._profiled = True
            else:
                self.train_state, metrics = step_fn(
                    self.train_state, arrays, step_rng)
            self._steps_used.add(id(step_fn))
            pending.append((metrics["loss"], batch.size))
            drain(2)
        drain(0)
        return total / max(n, 1)

    def validate(self) -> Dict[str, float]:
        from mmqg_tpu.parallel.multihost import to_host
        from mmqg_tpu.utils.pipelining import pipelined

        bs = self.config.eval_batch_size
        loss_sum, n = 0.0, 0
        bleu_sums = {k: 0.0 for k in M.BLEU_WEIGHTS}

        def dispatch(batch):
            arrays = batch_arrays(batch)
            if self.mesh is not None:
                from mmqg_tpu.parallel import pad_and_shard_batch
                arrays = pad_and_shard_batch(arrays, self.mesh)
            return self.validate_step(
                self.train_state["params"], self.train_state["model_state"],
                arrays)

        def finalize(out, batch):
            # trim mesh-padding rows (output row order is stable); to_host
            # all-gathers across processes when the mesh spans hosts and is
            # a plain np.asarray otherwise
            per_sample, toks = out
            per_sample = to_host(per_sample)[:len(batch.valid)]
            toks = to_host(toks)[:len(batch.valid)]
            loss = float(per_sample[batch.valid].sum())
            suite, k = evaluate_bleu(toks, batch.questions,
                                     self.val_ds.index_to_word, batch.valid)
            return loss, suite, k, batch.size

        # deferred device->host reads, same discipline as run_epoch: the
        # host scores batch i's BLEU while the device decodes i+1/i+2
        for loss, suite, k, size in pipelined(self.val_ds.batches(bs),
                                              dispatch, finalize):
            loss_sum += loss
            for key, v in suite.items():
                bleu_sums[key] += v * k
            n += size
        out = {"loss": loss_sum / max(n, 1)}
        out.update({k: v / max(n, 1) for k, v in bleu_sums.items()})
        return out

    def fit(self, epochs: Optional[int] = None) -> Tuple[Dict, int]:
        """Train with crash resilience: any interrupt/exception mid-training
        checkpoints "last" before propagating, so ``resume('last')`` restarts
        from the latest completed epoch (the reference lost everything on
        interrupt — its only resilience was try/except around saves,
        reference train.py:34-47).

        SIGTERM — how preemptible TPU VMs and cluster schedulers announce
        eviction — is converted into the same save-then-propagate path while
        fit() runs (main thread only; Python restricts signal handlers to
        it), so a preempted job resumes instead of losing its run."""
        epochs = epochs or self.config.epochs
        prev_handler, installed = None, False
        if threading.current_thread() is threading.main_thread():
            def _on_term(signum, frame):
                raise KeyboardInterrupt("SIGTERM (preemption)")
            try:
                prev_handler = signal.signal(signal.SIGTERM, _on_term)
                installed = True
            except ValueError:
                pass
        try:
            return self._fit_inner(epochs)
        except BaseException:
            if self.start_epoch > 0 or self.epoch_stats["train"]["loss"]:
                # epoch_stats is an absolute history (resume() restores the
                # pre-resume epochs), so its length IS the completed count
                last_done = len(self.epoch_stats["train"]["loss"]) - 1
                self.save("last", max(last_done, 0))
                self.write_stats()
            raise
        finally:
            if installed:
                # a None previous handler means "installed by non-Python
                # code" — not expressible to signal.signal; SIG_DFL is the
                # closest restorable disposition
                signal.signal(signal.SIGTERM,
                              prev_handler if prev_handler is not None
                              else signal.SIG_DFL)
            ckpt.wait_for_pending()  # async saves must land before return

    def _fit_inner(self, epochs: int) -> Tuple[Dict, int]:
        for epoch in range(self.start_epoch, epochs):
            t0 = time.time()
            train_loss = self.run_epoch(epoch)
            val = self.validate()
            self.epoch_stats["train"]["loss"].append(train_loss)
            self.epoch_stats["val"]["loss"].append(val["loss"])
            for k in ("bleu", "bleu_1", "bleu_2", "bleu_3"):
                self.epoch_stats["val"][k].append(val[k])
            self.log(f"epoch {epoch}: train_loss={train_loss:.3f} "
                     f"val_loss={val['loss']:.3f} val_bleu={val['bleu']:.3f} "
                     f"({time.time()-t0:.1f}s)")
            improved = val["loss"] < self.best_val  # reference train.py:198
            if improved:
                self.best_val = val["loss"]
                self.best_epoch = epoch
            self.save("last", epoch)
            from mmqg_tpu.parallel.multihost import is_primary
            if improved and is_primary():
                # "best" == this "last": copy the published file instead of
                # gathering + serialising the identical state a second time
                ckpt.copy_checkpoint(
                    self.config.checkpoint_dir, "last", "best",
                    backend=getattr(self.config, "checkpoint_backend",
                                    "msgpack"),
                    async_copy=getattr(self.config, "checkpoint_async",
                                       False))
        if self.profile_dir and not self._profiled:
            self.log("warning: --profile-dir set but no warm step was "
                     "traced (every batch hit a fresh compile — too few "
                     "batches per bucket)")
        self.write_stats()
        return self.epoch_stats, self.best_epoch

    # -------------------------------------------------------- persistence
    def save(self, alias: str, epoch: int) -> None:
        from mmqg_tpu.parallel.multihost import is_primary, to_host
        state = self.train_state
        if jax.process_count() > 1 and self.zero1:
            # ZeRO-1 moments (and FSDP params) are sharded ACROSS processes —
            # gathering them is a collective, so every process must run it
            # (before the primary-only return below). Non-zero1 multihost
            # state is replicated per host and needs no gather.
            state = jax.tree.map(
                lambda x: to_host(x) if hasattr(x, "ndim") else x, state)
        if not is_primary():
            return  # multi-host: process 0 owns the (shared) filesystem
        ckpt.save_checkpoint(
            self.config.checkpoint_dir, alias, state,
            metadata={"epoch": epoch, "best_val": self.best_val,
                      "best_epoch": self.best_epoch,
                      "mode": self.mc.mode, "n_vocab": self.mc.n_vocab},
            backend=getattr(self.config, "checkpoint_backend", "msgpack"),
            async_save=getattr(self.config, "checkpoint_async", False))

    def resume(self, alias: str = "last") -> bool:
        if not ckpt.has_checkpoint(self.config.checkpoint_dir, alias):
            return False
        self.train_state, meta = ckpt.load_checkpoint(
            self.config.checkpoint_dir, alias, self.train_state)
        if self.mesh is not None:
            self.train_state = self._place_on_mesh(self.train_state)
        self.start_epoch = int(meta.get("epoch", -1)) + 1
        self.best_val = float(meta.get("best_val", float("inf")))
        self.best_epoch = int(meta.get("best_epoch", -1))
        # restore the stats history so write_stats() appends instead of
        # clobbering the pre-resume epochs' curves; truncate to the epochs
        # actually completed (a crash may have written a partial tail)
        try:
            with open(self.config.stats_json_path) as f:
                prior = json.load(f)
            for section, series in self.epoch_stats.items():
                for key in series:
                    series[key] = list(
                        prior.get(section, {}).get(key, []))[:self.start_epoch]
        except (FileNotFoundError, json.JSONDecodeError):
            pass
        return True

    def write_stats(self) -> None:
        """stats.json parity (reference train.py:279-285) + config snapshot
        (reference train.py:287-290)."""
        from mmqg_tpu.parallel.multihost import is_primary
        if not is_primary():
            return
        self.config.ensure_dirs()
        with open(self.config.stats_json_path, "w") as f:
            json.dump(self.epoch_stats, f)
        self.config.save()
