"""Optimization-based gradient inversion as a single compiled program.

TPU-native counterpart of reference breaching/attacks/optimization_based_attack.py.
The reference runs a Python loop of 24k closure evaluations with double-backward
autograd per iteration (reference:110-143); here the whole attack is:

    one jitted `lax.scan` step:   grad_x [ distance(grad_theta L(theta, x), g*) + reg(x) ]
    vmapped over restart trials:  all `restarts.num_trials` candidates advance in
                                  lockstep on the same chip (or sharded over a mesh,
                                  see breaching_tpu/parallel/),
    chunked by `optim.callback`:  host logging/abort checks between compiled chunks.

The candidate is a *pytree* (`{"data": images}`, plus `{"labels": logits}` for the
joint DLG variant in optimization_with_label_attack.py), so every optimizer,
gradient transform, and best-iterate tracker below is written pytree-generically.

This is where the >=10x throughput over the torch reference comes from: the
second-order gradient is one fused XLA computation, restarts amortize onto the
MXU as extra batch, and no Python runs between iterations.
"""

from __future__ import annotations

import logging
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .auxiliaries.objectives import CosineSimilarity, Euclidean, objective_lookup
from .auxiliaries.optimizers import make_schedule, optimizer_lookup
from .auxiliaries.regularizers import TotalVariation, regularizer_lookup
from .base_attack import _BaseAttacker

log = logging.getLogger(__name__)


class OptimizationBasedAttacker(_BaseAttacker):
    """Implements the full spectrum of optimization-based attacks."""

    # reconstruct_fleet batches independent experiments through the loss's
    # per-trial `extra` channel; subclasses whose loss ignores `extra` or whose
    # reconstruct() adds stages on top (pyramid, joint labels, permutation)
    # must opt out or they would silently match the wrong gradients.
    supports_fleet = True

    def __init__(self, model, loss_fn, cfg_attack, setup):
        super().__init__(model, loss_fn, cfg_attack, setup)
        objective_cls = objective_lookup.get(self.cfg.objective.type)
        if objective_cls is None:
            raise ValueError(f"Unknown objective type {self.cfg.objective.type} given.")
        self.objective = objective_cls(**self.cfg.objective)
        self.regularizers = []
        if self.cfg.regularization:
            for key, rcfg in self.cfg.regularization.items():
                if rcfg and float(rcfg.get("scale", 0) or 0) > 0:
                    self.regularizers.append(regularizer_lookup[key](self.setup, **rcfg))
        self.augmentations = self._build_augmentations()

    def _build_augmentations(self):
        if not self.cfg.get("augmentations"):
            return None
        from .auxiliaries.augmentations import augmentation_lookup

        augs = [augmentation_lookup[key](**(acfg or {}))
                for key, acfg in self.cfg.augmentations.items()]
        return augs

    def __repr__(self):
        n = "\n" + " " * 18
        return f"""Attacker (of type {self.__class__.__name__}) with settings:
    Hyperparameter Template: {self.cfg.type}

    Objective: {repr(self.objective)}
    Regularizers: {n.join(repr(r) for r in self.regularizers)}

    Optimization Setup: {dict(self.cfg.optim)}"""

    # ------------------------------------------------------------------ public

    def reconstruct(self, server_payload, shared_data, server_secrets=None,
                    initial_data=None, dryrun=False):
        server_secrets = server_secrets or {}
        rec_models, labels, stats = self.prepare_attack(server_payload, shared_data)
        shared_data = self._shared_data_cache

        best_trees, opt_values, trial_stats = self._run_all_trials(
            rec_models, shared_data, labels, stats, initial_data, dryrun)

        scores = self._score_all_trials(best_trees, labels, rec_models, shared_data)
        optimal_tree = self._select_optimal_reconstruction(best_trees, scores, stats)
        reconstructed_data = self._extract_solution(optimal_tree, labels)

        if server_payload[0]["metadata"].modality == "text":
            reconstructed_data = self._postprocess_text_data(reconstructed_data)
        if "ClassAttack" in server_secrets:
            # Only a subset of images was reconstructed (reference:82-87).
            info = server_secrets["ClassAttack"]
            optimal = reconstructed_data["data"]
            full = jnp.zeros((info["true_num_data"], *optimal.shape[1:]), optimal.dtype)
            full = full.at[jnp.asarray(info["target_indx"]).reshape(-1)].set(optimal)
            reconstructed_data = dict(data=full, labels=jnp.asarray(info["all_labels"]))
        return reconstructed_data, stats

    def reconstruct_fleet(self, payload_lists, shared_lists, server_secrets=None,
                          dryrun=False):
        """Run N independent single-query reconstructions as ONE batched attack.

        The reference's benchmark loops experiments sequentially on one GPU
        (reference benchmark_breaches.py:62-77); on TPU the MXU is starved at
        batch 1, so the fleet stacks every experiment's target gradient on the
        trials axis and advances all of them in lockstep inside the same jitted
        scan — aggregate throughput scales ~1.5x per chip at 8 experiments
        while each experiment's math is identical to a solo run.

        payload_lists/shared_lists: one (server_payload, shared_data) pair per
        experiment; single-query experiments with equal shapes and equal model
        parameters. cfg.restarts.num_trials restarts are run per experiment.
        Returns (list of reconstructed_data dicts, stats of the batched run).
        """
        server_secrets = server_secrets or {}
        n = len(shared_lists)
        all_labels, all_targets, rec_models, stats = [], [], None, None
        # Fleet batching reuses the LAST experiment's rec_models/stats for all
        # experiments — correct only when every payload carries identical model
        # parameters. Benchmark waves satisfy this (one server, one model);
        # assert it loudly so a future config with per-user models cannot
        # silently match the wrong weights.
        ref_params = payload_lists[0][0]["parameters"]
        for payloads in payload_lists[1:]:
            same = jax.tree_util.tree_all(jax.tree_util.tree_map(
                lambda a, b: jnp.array_equal(a, b), ref_params,
                payloads[0]["parameters"]))
            if not bool(same):
                raise ValueError(
                    "Fleet mode requires identical model parameters across all "
                    "experiments (the batched trials share one weight tree); "
                    "got diverging payloads. Run these experiments solo.")
        for payloads, shareds in zip(payload_lists, shared_lists):
            rec_models, labels_i, stats = self.prepare_attack(payloads, shareds)
            normalized = self._shared_data_cache
            if len(normalized) != 1:
                raise ValueError("Fleet mode batches single-query experiments; "
                                 "got a multi-query payload.")
            all_labels.append(jnp.asarray(labels_i))
            all_targets.append(normalized[0]["gradients"])
        targets = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *all_targets)
        labels = jnp.stack(all_labels)
        trials_per = int(self.cfg.restarts.num_trials)
        if trials_per > 1:
            targets = jax.tree_util.tree_map(
                lambda x: jnp.repeat(x, trials_per, axis=0), targets)
            labels = jnp.repeat(labels, trials_per, axis=0)

        self._fleet_extra = (targets, labels)
        original_trials = self.cfg.restarts.num_trials
        self.cfg.restarts.num_trials = n * trials_per
        try:
            best_trees, best_vals, stats = self._run_all_trials(
                rec_models, self._shared_data_cache, all_labels[0], stats,
                None, dryrun)
        finally:
            self._fleet_extra = ()
            self.cfg.restarts.num_trials = original_trials

        if trials_per > 1:
            # Select each experiment's trial with the configured
            # restarts.scoring objective, exactly like the solo path
            # (reference optimization_based_attack.py:191-218) — argmin over
            # best_vals would ignore cfg.restarts.scoring. Scored against each
            # trial's OWN target gradient/labels, re-stacked here because the
            # first stack was donated into the chunk runner.
            score_targets = jax.tree_util.tree_map(
                lambda *xs: jnp.repeat(jnp.stack(xs), trials_per, axis=0),
                *all_targets)
            score_labels = jnp.repeat(jnp.stack(all_labels), trials_per, axis=0)
            scores = self._score_all_trials(
                best_trees, all_labels[0], rec_models, self._shared_data_cache,
                fleet_targets=score_targets, fleet_labels=score_labels)
        else:
            # one trial per experiment: selection is trivial and scoring would
            # only add a compile to the benchmark path
            scores = np.asarray(best_vals)
        results = []
        stats["fleet_opt_values"] = []
        for i in range(n):
            block = slice(i * trials_per, (i + 1) * trials_per)
            j = i * trials_per + int(np.argmin(scores[block]))
            stats["fleet_opt_values"].append(float(scores[j]))
            tree = jax.tree_util.tree_map(lambda x: jnp.asarray(x[j]), best_trees)
            results.append(self._extract_solution(tree, all_labels[i]))
        return results, stats

    # ---------------------------------------------------------- candidate tree

    def _init_candidate_tree(self, num_points, key, labels):
        """The optimization variable as a pytree. Base attack: just the data."""
        return dict(data=self._initialize_data((num_points, *self.candidate_shape), key))

    def _effective_labels(self, candidate_tree, labels):
        """Labels fed to the task loss; the joint attack derives them from the tree."""
        return labels

    def _project_tree(self, candidate_tree, min_box, max_box):
        if self.modality != "vision":
            return candidate_tree  # no pixel box for text embeddings
        out = dict(candidate_tree)
        # NOTE: deliberately jnp.clip, not ops.box_project — XLA fuses the clip
        # into the optimizer-update elementwise chain (zero extra HBM passes),
        # while a pallas_call is a fusion boundary that would force the whole
        # candidate through HBM twice. The Pallas kernel exists as a measured
        # alternative (tests/test_ops.py); the fused objective variants are the
        # ones worth opting into (attack.objective.type=fused-cosine-similarity).
        out["data"] = jnp.clip(candidate_tree["data"], min_box, max_box)
        return out

    def _extract_solution(self, optimal_tree, labels):
        return dict(data=optimal_tree["data"], labels=labels)

    # ------------------------------------------------------------------ loss

    # Regularizers that depend only on the candidate (no model intermediates).
    # Their gradients are added OUTSIDE the gradient-matching autodiff graph:
    # composing even a trivially cheap term into the double-backward changes
    # XLA's scheduling of the second-order conv chain and costs ~0.7ms/iter
    # (measured: TV alone is 0.02ms standalone but 45 it/s inside the graph).
    _CANDIDATE_ONLY_REGS = ("TotalVariation", "NormRegularization",
                            "OrthogonalityRegularization")

    def _split_regularizers(self):
        inner, outer = [], []
        for reg in self.regularizers:
            (outer if type(reg).__name__ in self._CANDIDATE_ONLY_REGS else inner).append(reg)
        return tuple(inner), tuple(outer)

    def _build_loss_fn(self, rec_models, shared_data, labels, augmentation_key=None,
                       include_outer_regs: bool = False):
        params_list = tuple(m.params for m in rec_models)
        buffers_list = tuple(m.buffers for m in rec_models)
        grads_list = tuple(d["gradients"] for d in shared_data)
        bn_train = bool(getattr(rec_models[0], "bn_train", False))
        need_capture = any(
            type(r).__name__ in ("DeepInversion", "FeatureRegularization")
            for r in self.regularizers)
        objective = self.objective
        inner_regs, outer_regs = self._split_regularizers()
        if include_outer_regs:  # scoring path: one total value
            inner_regs = inner_regs + outer_regs
            outer_regs = ()
        augmentations = self.augmentations
        differentiable_augs = bool(self.cfg.differentiable_augmentations)

        def matching_loss(candidate_tree, aug_key, extra=(), consts=None):
            # `extra` carries per-trial (target_grads, labels) for fleet mode:
            # N independent experiments vmapped over the trials axis (each
            # trial matches its own user's gradient — the TPU-native form of
            # the reference's sequential benchmark loop, benchmark_breaches.py).
            # `consts` optionally carries (params, buffers, grads) as RUNTIME
            # arguments — the attack scan passes them through the jit boundary
            # so ResNet-50/WRN-sized weights+targets are device buffers, not
            # HLO constants (baked constants blow the axon remote-compile
            # request limit with HTTP 413 above ~45M parameters).
            candidate = candidate_tree["data"]
            if augmentations:
                augmented = candidate
                for i, aug in enumerate(augmentations):
                    augmented = aug(augmented, jax.random.fold_in(aug_key, i))
                candidate = augmented if differentiable_augs else (
                    candidate + jax.lax.stop_gradient(augmented - candidate))
            p_list = consts["params"] if consts is not None else params_list
            b_list = consts["buffers"] if consts is not None else buffers_list
            if extra:
                trial_grads_list, eff_labels = (extra[0],), extra[1]
            else:
                trial_grads_list = consts["grads"] if consts is not None else grads_list
                # labels travel in consts so sharding modes can shard them
                # alongside the candidate batch (attack.impl.sharding="batch")
                base_labels = (consts["labels"] if consts is not None
                               and consts.get("labels") is not None else labels)
                eff_labels = self._effective_labels(candidate_tree, base_labels)
            total = jnp.zeros((), candidate.dtype)
            task_total = jnp.zeros((), candidate.dtype)
            intermediates = []
            for p, b, g in zip(p_list, b_list, trial_grads_list):
                obj, task, inter = objective(
                    p, b, g, candidate, eff_labels, bn_train=bn_train, capture=need_capture)
                total = total + obj
                task_total = task_total + task
                intermediates.append(inter)
            for reg in inner_regs:
                total = total + reg(candidate, intermediates)
            return total, task_total

        def outer_reg_value(candidate_tree):
            candidate = candidate_tree["data"]
            total = jnp.zeros((), candidate.dtype)
            for reg in outer_regs:
                total = total + reg(candidate, None)
            return total

        matching_loss.outer_reg_value = outer_reg_value if outer_regs else None
        matching_loss.consts = dict(params=params_list, buffers=buffers_list,
                                    grads=grads_list,
                                    labels=(jnp.asarray(labels)
                                            if labels is not None else None))
        matching_loss.meta = dict(bn_train=bn_train, need_capture=need_capture,
                                  has_outer_regs=bool(outer_regs),
                                  reg_names=tuple(type(r).__name__
                                                  for r in self.regularizers))
        return matching_loss

    # ------------------------------------------------------------------ core loop

    def _run_all_trials(self, rec_models, shared_data, labels, stats, initial_data, dryrun):
        from ..utils import split_key

        cfg_optim = self.cfg.optim
        num_trials = int(self.cfg.restarts.num_trials)
        max_iterations = 1 if dryrun else int(cfg_optim.max_iterations)
        callback = int(cfg_optim.callback or 0) or max_iterations

        metadata = shared_data[0]["metadata"]
        num_points = int(metadata["num_data_points"]) if metadata["num_data_points"] else (
            len(labels) if labels is not None else 1)
        local_hp = metadata.get("local_hyperparams")
        if local_hp is not None:
            local_hp = dict(local_hp)
            local_hp["labels"] = jnp.asarray(np.stack([np.asarray(l) for l in local_hp["labels"]]))

        self.objective.initialize(self.loss_fn, rec_models[0], local_hp, self.cfg.impl)
        for reg in self.regularizers:
            reg.initialize(rec_models, shared_data, labels)

        # --- candidate init: pytree with leading [trials, ...] axes ---
        key = split_key(self.setup)
        init_keys = jax.random.split(key, num_trials)
        candidates = jax.vmap(
            lambda k: self._init_candidate_tree(num_points, k, labels))(init_keys)
        if initial_data is not None:
            data0 = jnp.broadcast_to(jnp.asarray(initial_data)[None],
                                     candidates["data"].shape)
            candidates = dict(candidates, data=data0.astype(candidates["data"].dtype))

        total_loss = self._build_loss_fn(rec_models, shared_data, labels)
        if not hasattr(total_loss, "consts"):
            # subclass loss without the consts protocol (e.g. permutation):
            # keep the 4-arg calling convention, with nothing to thread through
            base_loss = total_loss

            def total_loss(c, k, e=(), consts=None, _base=base_loss):  # noqa: F811
                return _base(c, k, e)

            total_loss.outer_reg_value = getattr(base_loss, "outer_reg_value", None)
            total_loss.consts = {}
            total_loss.meta = {}
        optimizer, needs_value_fn = optimizer_lookup(
            cfg_optim.optimizer, float(cfg_optim.step_size),
            scheduler=cfg_optim.step_size_decay, warmup=int(cfg_optim.warmup or 0),
            max_iterations=max_iterations)
        lr_schedule = make_schedule(float(cfg_optim.step_size), cfg_optim.step_size_decay,
                                    int(cfg_optim.warmup or 0), max_iterations)

        boxed = bool(cfg_optim.boxed)
        langevin = float(cfg_optim.langevin_noise or 0.0)
        grad_clip = cfg_optim.grad_clip
        signed = cfg_optim.signed
        dm = self.dm.reshape(1, 1, 1, -1)
        ds = self.ds.reshape(1, 1, 1, -1)
        min_box, max_box = -dm / ds, (1 - dm) / ds
        noise_key = split_key(self.setup)

        def transform_grads(grads, iteration, trial_key):
            """Langevin noise + clipping + sign transforms, applied per pytree leaf
            (the reference applies the same ops to each optimized tensor,
            optimization_based_attack.py:166-184)."""
            leaves, treedef = jax.tree_util.tree_flatten(grads)
            out = []
            for i, grad in enumerate(leaves):
                if langevin > 0:
                    lr_now = lr_schedule(iteration)
                    noise = jax.random.normal(
                        jax.random.fold_in(jax.random.fold_in(trial_key, iteration), i),
                        grad.shape, grad.dtype)
                    grad = grad + langevin * lr_now * noise
                if grad_clip is not None:
                    sq = jnp.sum(jnp.square(grad))
                    sh = getattr(self, "_attack_shardings", None)
                    if sh and sh.get("mode") == "batch":
                        # the candidate gradient is batch-sharded: the clip
                        # norm is over the FULL per-trial tensor
                        sq = jax.lax.psum(sq, "model")
                    norm = jnp.sqrt(sq)
                    factor = jnp.where(norm > grad_clip, grad_clip / (norm + 1e-6), 1.0)
                    grad = grad * factor
                if signed in ("soft",):
                    scaling = 1.0 - iteration / max_iterations
                    grad = jnp.tanh(grad * scaling) / jnp.maximum(scaling, 1e-3)
                elif signed in ("hard", True):
                    grad = jnp.sign(grad)
                out.append(grad)
            return jax.tree_util.tree_unflatten(treedef, out)

        value_and_grad = jax.value_and_grad(total_loss, has_aux=True)
        outer_reg_value = getattr(total_loss, "outer_reg_value", None)
        if outer_reg_value is not None:
            base_outer_reg = outer_reg_value

            def outer_reg_value(candidate_tree):  # noqa: F811
                v = base_outer_reg(candidate_tree)
                sh = getattr(self, "_attack_shardings", None)
                if sh and sh.get("mode") == "batch":
                    # candidate-only regularizers are batch MEANS (TV/Norm):
                    # pmean of equal-shard local means == the full-batch value,
                    # and pmean's VJP scales the cotangent by 1/m — exactly the
                    # solo gradient of the global mean w.r.t. the local shard
                    v = jax.lax.pmean(v, "model")
                return v

        outer_vg = jax.value_and_grad(outer_reg_value) if outer_reg_value else None

        needs_aug_key = bool(self.augmentations) or langevin > 0

        def step(carry, iteration, consts):
            candidate, opt_state, best, best_val, trial_key, extra = carry
            # PRNG folding costs a per-step threefry launch; skip it when nothing
            # in the step consumes randomness.
            aug_key = jax.random.fold_in(trial_key, iteration) if needs_aug_key else trial_key
            (value, task_loss), grad = value_and_grad(candidate, aug_key, extra, consts)
            if outer_vg is not None:
                # candidate-only regularizers (TV/norm/orthogonality): value and
                # grad computed outside the second-order matching graph. Profiling
                # shows any second cotangent path into the candidate makes XLA pick
                # a slower convolution_add_fusion for the conv backward
                # (~0.6ms/iter on ResNet-18); the split keeps the matching graph
                # clean, though the regularized step still pays that fusion.
                reg_value, reg_grad = outer_vg(candidate)
                value = value + reg_value
                grad = jax.tree_util.tree_map(jnp.add, grad, reg_grad)
            raw_grad = grad
            grad = transform_grads(grad, iteration, trial_key)
            if needs_value_fn:
                def full_value(c):
                    v = total_loss(c, aug_key, extra, consts)[0]
                    return v + (outer_reg_value(c) if outer_reg_value else 0.0)

                # L-BFGS builds curvature pairs from the gradient it is given vs
                # the raw gradient of full_value at later evaluations — feed it
                # the untransformed gradient so the pairs are consistent
                # (sign/clip/langevin transforms are line-search-incompatible).
                updates, opt_state = optimizer.update(
                    raw_grad, opt_state, candidate, value=value, grad=raw_grad,
                    value_fn=full_value)
            else:
                updates, opt_state = optimizer.update(grad, opt_state, candidate)
            new_candidate = optax.apply_updates(candidate, updates)
            if boxed:
                new_candidate = self._project_tree(new_candidate, min_box, max_box)
            finite = jnp.isfinite(value)
            new_candidate = jax.tree_util.tree_map(
                lambda n, o: jnp.where(finite, n, o), new_candidate, candidate)
            improved = jnp.logical_and(finite, value < best_val)
            best = jax.tree_util.tree_map(
                lambda b, c: jnp.where(improved, c, b), best, candidate)
            best_val = jnp.where(improved, value, best_val)
            return (new_candidate, opt_state, best, best_val, trial_key, extra), (value, task_loss)

        def run_chunk_single(carry, start, length, consts):
            return jax.lax.scan(lambda c, i: step(c, i, consts), carry,
                                start + jnp.arange(length))

        chunk_runners = {}

        # impl.mixed_precision lowers matmul/conv accumulation to bfloat16 passes
        # (on v5e this is already XLA's default for f32; the flag makes it explicit
        # and portable to backends where the default is 3-pass).
        matmul_precision = "bfloat16" if self.cfg.impl.get("mixed_precision") else None

        # model weights + target gradients cross the jit boundary as runtime
        # buffers (see matching_loss.consts) — baking them as HLO constants
        # blows the axon remote-compile request limit above ~45M params
        loss_consts = jax.tree_util.tree_map(jnp.asarray, total_loss.consts)

        def run_chunk(carry, start, length):
            if length not in chunk_runners:
                vmapped = jax.vmap(lambda c, s, k: run_chunk_single(c, s, length, k),
                                   in_axes=(0, None, None))
                sharding = getattr(self, "_attack_shardings", None)
                if sharding and sharding["mode"] in ("restarts", "batch"):
                    # shard_map, not GSPMD: every device runs the UNCHANGED
                    # single-device chunk program on its own slice — of the
                    # trials batch ("restarts"), or of trials x candidate batch
                    # ("batch", where the objective pmeans its task gradient
                    # over 'model' to reconstitute the exact full-batch user
                    # gradient). The GSPMD partitioner produces numerically
                    # WRONG values for batch-sharded conv backward on some
                    # backends; shard_map matches solo to ~1e-6
                    # (tests/test_parallel.py, dryrun_multichip).
                    shmap = getattr(jax, "shard_map", None)
                    if shmap is None:  # older jax
                        from jax.experimental.shard_map import shard_map as shmap
                    in_specs, out_specs = sharding["shmap_in"], sharding["shmap_out"]
                    specs = dict(in_specs=in_specs, out_specs=out_specs)
                    try:
                        mapped = shmap(vmapped, mesh=sharding["mesh"],
                                       check_vma=False, **specs)
                    except TypeError:  # older shard_map: check_rep instead
                        mapped = shmap(vmapped, mesh=sharding["mesh"],
                                       check_rep=False, **specs)
                    chunk_runners[length] = jax.jit(mapped, donate_argnums=(0,))
                elif sharding:  # "experimental-2d": GSPMD channel sharding, pinned both ways
                    # pin carry shardings on BOTH sides of the jit: without
                    # out_shardings GSPMD may emit outputs with a different
                    # layout than the committed inputs, and chunk 2 would
                    # silently retrace+recompile the whole runner
                    chunk_runners[length] = jax.jit(
                        vmapped, donate_argnums=(0,),
                        in_shardings=(sharding["carry_sh"], None,
                                      sharding["consts_sh"]),
                        out_shardings=(sharding["carry_sh"],
                                       (sharding["val_sh"], sharding["val_sh"])))
                else:
                    # donate the carry: candidates/opt state/best buffers update
                    # in place
                    chunk_runners[length] = jax.jit(vmapped, donate_argnums=(0,))
            if matmul_precision:
                with jax.default_matmul_precision(matmul_precision):
                    return chunk_runners[length](carry, start, loss_consts)
            return chunk_runners[length](carry, start, loss_consts)

        opt_state = jax.vmap(optimizer.init)(candidates)
        # materialize a distinct copy: best and candidates must not alias once the
        # chunk runner donates its input buffers
        best = jax.tree_util.tree_map(jnp.copy, candidates)
        # explicit dtype: a weak-typed inf would flip to strong after chunk 1 and
        # silently retrace the whole chunk runner
        best_val = jnp.full((num_trials,), jnp.inf, dtype=jnp.float32)
        trial_keys = jax.random.split(noise_key, num_trials)
        # fleet mode: per-trial (target gradients, labels) stacked on the trials
        # axis, threaded through the scan carry so the same chunk runner vmaps
        # them alongside the candidates (returned unchanged every step)
        extra = tuple(getattr(self, "_fleet_extra", ()))
        carry = (candidates, opt_state, best, best_val, trial_keys, extra)

        # --- attack-state checkpointing (resume a preempted 24k-iteration run) ---
        ckpt_path = self.cfg.impl.get("checkpoint_path")
        ckpt_every = int(self.cfg.impl.get("checkpoint_every", 0) or 0)
        iteration = 0
        if ckpt_path:
            from ..utils_checkpoint import load_attack_state

            restored = load_attack_state(ckpt_path, carry)
            if restored is not None:
                carry, iteration = restored

        # --- multi-chip SPMD (attack.impl.sharding): place the PRODUCTION
        # chunk runner's state on a device mesh. The same jitted scan then runs
        # on 1 or N chips; XLA partitions the vmapped trials over 'restarts'
        # and (mode "2d") inserts psum collectives over 'model' for the
        # channel-sharded gradient-matching reductions. The reference is
        # strictly single-device (SURVEY §2.9) — this is the TPU scaling path,
        # exercised end-to-end by __graft_entry__.dryrun_multichip. ---
        sharding_mode = self.cfg.impl.get("sharding") or None
        self._attack_shardings = None
        if sharding_mode:
            carry, loss_consts = self._shard_attack_state(
                sharding_mode, num_trials, carry, loss_consts,
                num_points=num_points,
                loss_meta=getattr(total_loss, "meta", {}),
                needs_value_fn=needs_value_fn)

        # --- cost-analysis probe (bench.py MFU accounting): abstract arg
        # structs let chunk_cost_analysis() re-lower the cached runner later
        # without holding (donated) device buffers ---
        def _struct(x):
            return jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x))

        self._cost_probe = None
        probe_args = jax.tree_util.tree_map(
            _struct, (carry, jnp.asarray(iteration, jnp.int32), loss_consts))

        # --- profiler hook: trace the first post-compile chunk ---
        trace_dir = self.cfg.impl.get("trace_dir")
        traced = False

        for t in range(num_trials):
            stats.setdefault(f"Trial_{t}_Val", [])
        stats.setdefault("chunk_iters", [])
        stats.setdefault("chunk_time", [])
        current_wallclock = time.time()
        # impl.JIT=False runs the scan eagerly for debugging (reference's `JIT`
        # impl knob, case/impl/default.yaml:24)
        import contextlib

        jit_context = jax.disable_jit() if self.cfg.impl.get("JIT") is False \
            else contextlib.nullcontext()
        with jit_context:
          try:  # Ctrl-C returns the best-so-far instead of losing the run
            while iteration < max_iterations:
                length = min(callback, max_iterations - iteration)
                if trace_dir and not traced and stats["chunk_iters"]:
                    from jax import profiler as jax_profiler

                    with jax_profiler.trace(str(trace_dir)):
                        carry, (values, task_losses) = run_chunk(carry, jnp.asarray(iteration, jnp.int32), length)
                        jax.block_until_ready(values)
                    traced = True
                    log.info(f"Saved profiler trace of one attack chunk to {trace_dir}.")
                else:
                    carry, (values, task_losses) = run_chunk(carry, jnp.asarray(iteration, jnp.int32), length)
                values = np.asarray(values)       # [trials, chunk] — blocks until chunk done
                task_losses = np.asarray(task_losses)
                iteration += length
                for t in range(num_trials):
                    stats[f"Trial_{t}_Val"].extend(values[t].tolist())
                timestamp = time.time()
                elapsed = timestamp - current_wallclock
                stats["chunk_iters"].append(length)
                stats["chunk_time"].append(elapsed)
                log.info(
                    f"| It: {iteration} | Rec. loss: {values[:, -1].mean():2.4f} | "
                    f"Task loss: {task_losses[:, -1].mean():2.4f} | T: {elapsed:4.2f}s | "
                    f"{num_trials * length / max(elapsed, 1e-9):,.1f} it/s")
                current_wallclock = timestamp
                if ckpt_path and ckpt_every and len(stats["chunk_iters"]) % ckpt_every == 0:
                    from ..utils_checkpoint import save_attack_state

                    save_attack_state(ckpt_path, carry, iteration)
                if not np.isfinite(values[:, -1]).any():
                    log.info(f"Recovery loss is non-finite in iteration {iteration}. "
                             f"Cancelling reconstruction!")
                    break
          except KeyboardInterrupt:
            # Partial results on manual interrupt (reference
            # optimization_based_attack.py:75-77, 139-141): `carry` holds the
            # state of the last dispatched chunk — its best tree is returned.
            # By the time the blocking np.asarray(values) can observe the
            # interrupt, the new carry is already assigned, so the donated old
            # buffers are never read.
            stats["interrupted_at"] = iteration
            log.info(f"Recovery interrupted manually at iteration {iteration}; "
                     f"returning best-so-far candidates.")

        if chunk_runners:
            full = max(chunk_runners)  # the steady-state (longest) chunk
            self._cost_probe = dict(runner=chunk_runners[full], args=probe_args,
                                    chunk_length=full, trials=num_trials,
                                    precision=matmul_precision)

        _, _, best, best_val, _, _ = carry
        return jax.device_get(best), np.asarray(best_val), stats

    def chunk_cost_analysis(self):
        """XLA cost model of one compiled attack chunk (for MFU accounting).

        Re-lowers the steady-state chunk runner on abstract arg structs — a
        compile-cache hit when shapes match the run that populated it — and
        returns the optimized-HLO FLOP/byte counts plus the chunk geometry.
        NOTE: XLA's cost_analysis() counts a `lax.scan` body ONCE regardless
        of trip count (convention pinned by tests/test_bench_cost.py), so the
        returned flops/bytes are per SCAN STEP (covering all `trials` vmapped
        streams of that step), NOT for the whole `chunk_length`-step program.
        Returns None before any reconstruct() call or if the backend lacks
        cost analysis.
        """
        probe = getattr(self, "_cost_probe", None)
        if probe is None:
            return None
        import contextlib

        ctx = (jax.default_matmul_precision(probe["precision"])
               if probe["precision"] else contextlib.nullcontext())
        try:
            with ctx:
                compiled = probe["runner"].lower(*probe["args"]).compile()
            ca = compiled.cost_analysis()
        except Exception as err:  # backend without cost analysis — not fatal
            log.info(f"chunk_cost_analysis unavailable: {err}")
            return None
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        return dict(flops=float(ca.get("flops", 0.0)),
                    bytes_accessed=float(ca.get("bytes accessed", 0.0)),
                    chunk_length=probe["chunk_length"], trials=probe["trials"])

    # ------------------------------------------------------------------ sharding

    def _shard_attack_state(self, mode, num_trials, carry, loss_consts,
                            num_points=None, loss_meta=None,
                            needs_value_fn=False):
        """Shard the chunk-runner inputs over a mesh (attack.impl.sharding).

        mode "restarts": trials axis data-parallel via shard_map; params/
        buffers/targets replicated on every chip; bit-comparable to solo.

        mode "batch": trials over 'restarts' AND the candidate batch over the
        leftover 'model' axis, via shard_map. Each device computes the task
        gradient of its micro-batch and a pmean over 'model' reconstitutes the
        exact full-batch user gradient before the matching distance (the task
        loss is a batch mean and shards are equal-sized), so trajectories
        match solo to float tolerance — asserted at rtol 1e-5 by
        __graft_entry__.dryrun_multichip. This is the trustworthy model-axis
        scaling mode: it splits the double-backward's activation memory across
        chips (the same bottleneck attack.impl.grad_accum trades FLOPs for).

        mode "experimental-2d" (formerly "2d"): GSPMD channel-sharding of
        parameter/target-gradient tensors (out-channel megatron rule,
        parallel/mesh.py:params_partition_specs). The SPMD-partitioned conv
        backward deviates numerically on some backends — demo-grade, hence the
        name; use "batch" or "restarts" in production.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel import make_attack_mesh, params_partition_specs

        if mode in ("2d", "model"):
            log.warning(f"attack.impl.sharding={mode!r} is renamed "
                        f"'experimental-2d' (numerically demo-grade; see "
                        f"docstring). Prefer 'batch' or 'restarts'.")
            mode = "experimental-2d"
        if mode not in ("restarts", "batch", "experimental-2d"):
            raise ValueError(f"Unknown attack.impl.sharding mode {mode!r}; "
                             f"use 'restarts', 'batch', or 'experimental-2d'.")
        mesh = make_attack_mesh(num_trials,
                                "model" if mode != "restarts" else "restarts")
        trials = NamedSharding(mesh, P("restarts"))
        replicated = NamedSharding(mesh, P())
        m = mesh.shape["model"]

        if mode == "batch" and m > 1:
            meta = loss_meta or {}
            problems = []
            if not loss_consts:
                problems.append("attack loss without the consts protocol")
            if num_points is None or num_points % m != 0:
                problems.append(f"batch of {num_points} not divisible by the "
                                f"model axis ({m})")
            if getattr(self.objective, "local_hyperparams", None) is not None:
                problems.append("multi-step (fedAVG-unrolled) objective")
            if meta.get("bn_train"):
                problems.append("BatchNorm train mode (batch stats span shards)")
            if meta.get("need_capture"):
                problems.append("capture-intermediates regularizers "
                                "(DeepInversion/FeatureRegularization)")
            if "OrthogonalityRegularization" in (meta.get("reg_names") or ()):
                problems.append("cross-example OrthogonalityRegularization")
            if needs_value_fn:
                problems.append("closure optimizers (L-BFGS inner products "
                                "span the full candidate)")
            if len(carry) >= 6 and carry[5]:
                problems.append("fleet mode (per-trial targets would need "
                                "their own batch specs)")
            if problems:
                raise ValueError(
                    "attack.impl.sharding='batch' cannot shard this attack: "
                    + "; ".join(problems) + ". Use sharding='restarts'.")

        if mode == "batch" and m > 1:
            # per-leaf carry specs: float leaves whose axis 1 is the candidate
            # batch shard over ('restarts','model'); everything else (PRNG
            # keys, int step counters, best_val) over 'restarts' only
            def carry_spec(leaf):
                if (hasattr(leaf, "ndim") and leaf.ndim >= 2
                        and leaf.shape[1] == num_points
                        and jnp.issubdtype(jnp.result_type(leaf), jnp.floating)):
                    return P("restarts", "model")
                return P("restarts")

            carry_specs = jax.tree_util.tree_map(carry_spec, carry)
            consts_specs = dict(
                params=jax.tree_util.tree_map(lambda _: P(), loss_consts["params"]),
                buffers=jax.tree_util.tree_map(lambda _: P(), loss_consts["buffers"]),
                grads=jax.tree_util.tree_map(lambda _: P(), loss_consts["grads"]),
            )
            if loss_consts.get("labels") is not None:
                consts_specs["labels"] = P("model")
            elif "labels" in loss_consts:
                consts_specs["labels"] = None
            carry_sh = jax.tree_util.tree_map(
                lambda s: NamedSharding(mesh, s), carry_specs)
            consts_sh = jax.tree_util.tree_map(
                lambda s: NamedSharding(mesh, s), consts_specs)
            carry = jax.tree_util.tree_map(jax.device_put, carry, carry_sh)
            loss_consts = jax.tree_util.tree_map(
                jax.device_put, loss_consts, consts_sh)
            # the objective pmeans its task gradient over 'model' (exact; see
            # objectives.GradientLoss.initialize) — read at trace time
            self.objective.shard_axis = "model"
            self._attack_shardings = dict(
                mode="batch", mesh=mesh,
                shmap_in=(carry_specs, P(), consts_specs),
                shmap_out=(carry_specs, (P("restarts"), P("restarts"))),
                carry_sh=carry_sh, consts_sh=consts_sh, val_sh=trials)
        elif mode == "experimental-2d" and m > 1 and loss_consts:
            log.warning(
                "sharding='experimental-2d' uses the GSPMD partitioner for "
                "channel-sharded parameters; on some backends the partitioned "
                "conv backward deviates numerically from single-device "
                "execution (XLA SPMD rematerialization fallback). 'batch' and "
                "'restarts' run through shard_map and match solo tightly.")
            carry = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, trials), carry)
            specs = dict(
                params=tuple(params_partition_specs(p, mesh)
                             for p in loss_consts["params"]),
                buffers=tuple(jax.tree_util.tree_map(lambda _: P(), b)
                              for b in loss_consts["buffers"]),
                grads=tuple(params_partition_specs(g, mesh)
                            for g in loss_consts["grads"]))
            if "labels" in loss_consts:
                specs["labels"] = (jax.tree_util.tree_map(
                    lambda _: P(), loss_consts["labels"])
                    if loss_consts.get("labels") is not None else None)
            consts_shardings = jax.tree_util.tree_map(
                lambda s: NamedSharding(mesh, s), specs)
            loss_consts = jax.tree_util.tree_map(
                jax.device_put, loss_consts, consts_shardings)
            self._attack_shardings = dict(
                mode="experimental-2d", mesh=mesh,
                carry_sh=jax.tree_util.tree_map(lambda _: trials, carry),
                consts_sh=consts_shardings, val_sh=trials)
        else:
            consts_shardings = jax.tree_util.tree_map(
                lambda _: replicated, loss_consts)
            loss_consts = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, replicated), loss_consts)
            carry = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, trials), carry)
            trials_spec, none_spec = P("restarts"), P()
            carry_specs = jax.tree_util.tree_map(lambda _: trials_spec, carry)
            consts_specs = jax.tree_util.tree_map(lambda _: none_spec, loss_consts)
            self._attack_shardings = dict(
                mode="restarts", mesh=mesh,
                shmap_in=(carry_specs, none_spec, consts_specs),
                shmap_out=(carry_specs, (trials_spec, trials_spec)),
                carry_sh=jax.tree_util.tree_map(lambda _: trials, carry),
                consts_sh=consts_shardings, val_sh=trials)
        log.info(f"Attack state sharded over mesh {dict(mesh.shape)} "
                 f"({mesh.devices.size} devices, mode="
                 f"{self._attack_shardings['mode']}).")
        return carry, loss_consts

    # ------------------------------------------------------------------ scoring

    def _score_all_trials(self, best_trees, labels, rec_models, shared_data,
                          fleet_targets=None, fleet_labels=None):
        """Score every trial with cfg.restarts.scoring (reference
        optimization_based_attack.py:191-218). Solo: all trials share one
        target gradient + label set. Fleet (`fleet_targets`/`fleet_labels`
        given, leading axis = trials): each trial scores against its own
        stacked target/labels; single-query only."""
        scoring = self.cfg.restarts.scoring
        if scoring in ("euclidean", "cosine-similarity"):
            objective = Euclidean() if scoring == "euclidean" else CosineSimilarity()
            local_hp = shared_data[0]["metadata"].get("local_hyperparams")
            if local_hp is not None:
                local_hp = dict(local_hp)
                local_hp["labels"] = jnp.asarray(np.stack([np.asarray(l) for l in local_hp["labels"]]))
            objective.initialize(self.loss_fn, rec_models[0], local_hp, self.cfg.impl)

            bn_train = bool(getattr(rec_models[0], "bn_train", False))

            if fleet_targets is not None:
                def score_fleet(candidate_tree, grads, lbls, consts):
                    eff_labels = self._effective_labels(candidate_tree, lbls)
                    obj, _, _ = objective(consts["params"][0], consts["buffers"][0],
                                          grads, candidate_tree["data"], eff_labels,
                                          bn_train=bn_train)
                    return obj

                score_consts = jax.tree_util.tree_map(jnp.asarray, dict(
                    params=(rec_models[0].params,),
                    buffers=(rec_models[0].buffers or {},)))
                scores = np.asarray(
                    jax.jit(jax.vmap(score_fleet, in_axes=(0, 0, 0, None)))(
                        jax.tree_util.tree_map(jnp.asarray, best_trees),
                        fleet_targets, fleet_labels, score_consts))
                return np.where(np.isfinite(scores), scores, np.inf)

            def score_one(candidate_tree, consts):
                # params/grads as jit args, not baked constants (413 limit)
                eff_labels = self._effective_labels(candidate_tree, labels)
                total = 0.0
                for p, b, g in zip(consts["params"], consts["buffers"], consts["grads"]):
                    obj, _, _ = objective(p, b, g, candidate_tree["data"], eff_labels,
                                          bn_train=bn_train)
                    total = total + obj
                return total

            score_consts = jax.tree_util.tree_map(jnp.asarray, dict(
                params=tuple(m.params for m in rec_models),
                buffers=tuple(m.buffers or {} for m in rec_models),
                grads=tuple(d["gradients"] for d in shared_data)))
            scores = np.asarray(jax.jit(jax.vmap(score_one, in_axes=(0, None)))(
                jax.tree_util.tree_map(jnp.asarray, best_trees), score_consts))
        elif scoring in ("TV", "total-variation"):
            tv = TotalVariation(scale=1.0)
            scores = np.asarray(jax.jit(jax.vmap(lambda t: tv(t["data"])))(
                jax.tree_util.tree_map(jnp.asarray, best_trees)))
        else:
            raise ValueError(f"Scoring mechanism {scoring} not implemented.")
        return np.where(np.isfinite(scores), scores, np.inf)

    def _select_optimal_reconstruction(self, best_trees, scores, stats):
        optimal_index = int(np.argmin(scores))
        stats["opt_value"] = float(scores[optimal_index])
        tree_at = lambda i: jax.tree_util.tree_map(lambda x: jnp.asarray(x[i]), best_trees)
        if np.isfinite(scores[optimal_index]):
            log.info(f"Optimal candidate solution with rec. loss {scores[optimal_index]:2.4f} "
                     f"selected (trial {optimal_index}).")
            return tree_at(optimal_index)
        log.info("No valid reconstruction could be found.")
        return jax.tree_util.tree_map(jnp.zeros_like, tree_at(0))

    def _postprocess_text_data(self, reconstructed_data):
        from .auxiliaries.text_utils import postprocess_text_data

        return postprocess_text_data(self, reconstructed_data)
