"""FL users: fedSGD single-step, fedAVG multi-step, and secure-aggregation silos.

TPU-native counterpart of reference breaching/cases/users.py (UserSingleStep:31-306,
UserMultiStep:308-413, MultiUserAggregate:431-533). Users are thin stateful shells
around pure jitted update functions:

- the single-step update is `jax.grad` of the task loss over the parameter pytree,
- per-example DP clipping is a vmapped per-example gradient + clip + mean
  (the reference loops over examples in Python, users.py:158-165),
- the fedAVG inner loop is a `lax.scan` of SGD steps carrying the parameter pytree,
- local DP noise uses explicit PRNG keys.

BatchNorm semantics mirror the reference (users.py:132-143): with server-provided
buffers the model runs in eval mode; without them it runs in train mode with
cumulative running stats, so a single-step user shares exactly its batch statistics.
"""

from __future__ import annotations

import logging
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .data import construct_dataloader

log = logging.getLogger(__name__)


def construct_user(model, loss_fn, cfg_case, setup):
    """User factory (reference: breaching/cases/users.py:13-28)."""
    cfg_user = cfg_case.user
    if cfg_user.user_type == "local_gradient":
        dataloader = construct_dataloader(cfg_case.data, cfg_case.impl, user_idx=cfg_user.user_idx)
        return UserSingleStep(model, loss_fn, dataloader, setup, cfg_user.user_idx, cfg_user)
    elif cfg_user.user_type == "local_update":
        dataloader = construct_dataloader(cfg_case.data, cfg_case.impl, user_idx=cfg_user.user_idx)
        return UserMultiStep(model, loss_fn, dataloader, setup, cfg_user.user_idx, cfg_user)
    elif cfg_user.user_type == "multiuser_aggregate":
        dataloaders, user_indices = [], list(range(*cfg_user.user_range))
        for idx in user_indices:
            dataloaders.append(construct_dataloader(cfg_case.data, cfg_case.impl, user_idx=idx))
        return MultiUserAggregate(model, loss_fn, dataloaders, setup, user_indices, cfg_user)
    raise ValueError(f"Invalid user type {cfg_user.user_type}.")


def _tree_global_norm(tree):
    return jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in jax.tree_util.tree_leaves(tree)))


def _tree_add_noise(tree, key, scale, distribution):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    keys = jax.random.split(key, len(leaves))
    noisy = []
    for leaf, k in zip(leaves, keys):
        if distribution == "gaussian":
            noise = jax.random.normal(k, leaf.shape, leaf.dtype)
        else:  # laplacian
            noise = jax.random.laplace(k, leaf.shape, leaf.dtype)
        noisy.append(leaf + scale * noise)
    return jax.tree_util.tree_unflatten(treedef, noisy)


class UserSingleStep:
    """A fedSGD user sharing a single batch gradient."""

    def __init__(self, model, loss_fn, dataloader, setup, idx, cfg_user):
        self.model = model
        self.loss = loss_fn
        self.dataloader = dataloader
        self.setup = setup
        self.user_idx = idx
        self.cfg = cfg_user
        self.num_data_points = int(cfg_user.num_data_points)
        self.provide_labels = bool(cfg_user.provide_labels)
        self.provide_buffers = bool(cfg_user.provide_buffers)
        self.provide_num_data_points = bool(cfg_user.provide_num_data_points)
        ldp = cfg_user.local_diff_privacy
        self.gradient_noise = float(ldp.gradient_noise)
        self.input_noise = float(ldp.input_noise)
        self.noise_distribution = str(ldp.distribution)
        self.clip_value = float(ldp.get("per_example_clipping", 0.0))
        self.counted_queries = 0
        self.defense_repr = []
        if self.gradient_noise > 0:
            self.defense_repr.append(
                f"Defense: local {self.noise_distribution} gradient noise, scale {self.gradient_noise}.")
        if self.input_noise > 0:
            self.defense_repr.append(
                f"Defense: local {self.noise_distribution} input noise, scale {self.input_noise}.")
        if self.clip_value > 0:
            self.defense_repr.append(f"Defense: per-example gradient clipping at {self.clip_value}.")
        self._update_fn_cache = {}

    def __repr__(self):
        n = "\n"
        return f"""User (of type {self.__class__.__name__}):
    Number of data points: {self.num_data_points}
    Threat model: labels {self.provide_labels}, buffers {self.provide_buffers}, n {self.provide_num_data_points}
    Dataset: {self.dataloader.name}, user idx {self.user_idx}
    {n.join(self.defense_repr)}"""

    # ---- pure update functions (jitted once per (train-mode, clipping) combo) ----

    def _make_update_fn(self, bn_train: bool, clipped: bool):
        model, loss_fn = self.model, self.loss
        input_noise, grad_noise = self.input_noise, self.gradient_noise
        distribution, clip_value = self.noise_distribution, self.clip_value

        def task_grads(params, buffers, inputs, labels):
            def task_loss(p):
                outputs, aux = model.apply(p, buffers, inputs, train=bn_train)
                return loss_fn(outputs, labels), aux
            (_, aux), grads = jax.value_and_grad(task_loss, has_aux=True)(params)
            return grads, aux.get("batch_stats", buffers)

        def _update(params, buffers, inputs, labels, key):
            key_in, key_grad = jax.random.split(key)
            if input_noise > 0:
                inputs = _tree_add_noise(inputs, key_in, input_noise, distribution)
            if clipped:
                def one_example(x, y):
                    grads, _ = task_grads(params, buffers, x[None], y[None])
                    norm = _tree_global_norm(grads)
                    factor = jnp.minimum(1.0, clip_value / (norm + 1e-6))
                    return jax.tree_util.tree_map(lambda g: g * factor, grads)
                per_example = jax.vmap(one_example)(inputs, labels)
                grads = jax.tree_util.tree_map(lambda g: jnp.mean(g, axis=0), per_example)
                _, new_buffers = task_grads(params, buffers, inputs, labels)
            else:
                grads, new_buffers = task_grads(params, buffers, inputs, labels)
            if grad_noise > 0:
                grads = _tree_add_noise(grads, key_grad, grad_noise, distribution)
            return grads, new_buffers

        def update(params, buffers, inputs, labels, key):
            # The victim's update runs ONCE per experiment, so exact-f32 matmuls
            # cost nothing — but TPU DEFAULT precision computes f32 matmuls/convs
            # in bf16 passes, and that noise wrecks precision-sensitive analytic
            # attacks (R-GAP drops from PSNR 45 to 6). HIGHEST makes the simulated
            # FL exchange match the reference's exact-f32 CPU/CUDA math; the
            # attacker's own hot loop keeps DEFAULT.
            with jax.default_matmul_precision("highest"):
                return _update(params, buffers, inputs, labels, key)

        return jax.jit(update)

    def _update_fn(self, bn_train: bool):
        clipped = self.clip_value > 0
        key = (bn_train, clipped)
        if key not in self._update_fn_cache:
            self._update_fn_cache[key] = self._make_update_fn(bn_train, clipped)
        return self._update_fn_cache[key]

    # ---- protocol ----

    def compute_local_updates(self, server_payload, custom_data=None):
        self.counted_queries += 1
        data = self._load_data() if custom_data is None else custom_data
        self.data_key = "input_ids" if "input_ids" in data else "inputs"

        parameters = server_payload["parameters"]
        buffers = server_payload["buffers"]
        bn_train = buffers is None and self.model.has_batchnorm
        local_buffers = buffers if buffers is not None else self.model.buffers
        log.info(f"Computing user update on user {self.user_idx} in model mode: "
                 f"{'training' if bn_train else 'eval'}.")

        from ..utils import split_key
        key = split_key(self.setup)
        inputs = jnp.asarray(data[self.data_key])
        labels = jnp.asarray(data["labels"])
        grads, new_buffers = self._update_fn(bn_train)(parameters, local_buffers, inputs, labels, key)

        shared_buffers = new_buffers if (buffers is None and self.model.has_batchnorm) else None
        metadata = dict(
            num_data_points=self.num_data_points if self.provide_num_data_points else None,
            labels=jnp.sort(labels) if self.provide_labels else None,
            local_hyperparams=None,
            data_key=self.data_key,
        )
        shared_data = dict(
            gradients=grads,
            buffers=shared_buffers if self.provide_buffers else None,
            metadata=metadata,
        )
        true_user_data = dict(data=inputs, labels=labels, buffers=shared_buffers)
        return shared_data, true_user_data

    def _load_data(self):
        """Draw `num_data_points` examples from this user's partition
        (reference: users.py:200-227)."""
        blocks, num_samples = [], 0
        for block in self.dataloader:
            blocks.append(block)
            num_samples += block["labels"].shape[0]
            if num_samples >= self.num_data_points:
                break
        if num_samples < self.num_data_points:
            raise ValueError(
                f"User {self.user_idx} does not have the requested {self.num_data_points} samples "
                f"(only {num_samples} available).")
        return {
            key: np.concatenate([b[key] for b in blocks])[: self.num_data_points]
            for key in blocks[0]
        }

    def print(self, user_data, tokenizer=None, **kwargs):
        """Print decoded text data (reference: users.py:229-234). Without a
        tokenizer, token ids are printed directly."""
        data = np.asarray(user_data["data"])
        for row in data.reshape(data.shape[0], -1):
            if tokenizer is not None:
                print(tokenizer.decode(row.tolist()))
            else:
                print(" ".join(str(int(t)) for t in row))

    def print_with_confidence(self, user_data, tokenizer=None, **kwargs):
        """Print tokens annotated with attack confidence (reference: users.py:236-250)."""
        data = np.asarray(user_data["data"])
        confidence = np.asarray(user_data.get("confidence", np.ones_like(data, np.float32)))
        for row, conf in zip(data.reshape(data.shape[0], -1),
                             confidence.reshape(data.shape[0], -1)):
            parts = []
            for token, c in zip(row, conf):
                text = tokenizer.decode([int(token)]) if tokenizer is not None else str(int(token))
                parts.append(f"{text}[{float(c):.2f}]")
            print(" ".join(parts))

    def print_and_mark_correct(self, user_data, true_user_data, tokenizer=None, **kwargs):
        """Print tokens marking matches with the ground truth (reference: users.py:252-266)."""
        data = np.asarray(user_data["data"])
        truth = np.asarray(true_user_data["data"])
        for row, gt in zip(data.reshape(data.shape[0], -1), truth.reshape(truth.shape[0], -1)):
            parts = []
            for token, gt_token in zip(row, gt):
                text = tokenizer.decode([int(token)]) if tokenizer is not None else str(int(token))
                parts.append(f"{text}{'✓' if int(token) == int(gt_token) else '✗'}")
            print(" ".join(parts))

    def plot(self, user_data, scale=False, print_labels=False, savefile=None):
        """Render user data to a matplotlib figure (reference: users.py:268-305)."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        data = np.asarray(user_data["data"], np.float32)
        mean = np.asarray(self.dataloader.dataset.mean)
        std = np.asarray(self.dataloader.dataset.std)
        if scale:
            lo = data.min(axis=(1, 2), keepdims=True)
            hi = data.max(axis=(1, 2), keepdims=True)
            data = (data - lo) / np.maximum(hi - lo, 1e-6)
        else:
            data = np.clip(data * std + mean, 0, 1)
        grid = int(np.ceil(np.sqrt(data.shape[0])))
        fig, axes = plt.subplots(grid, grid, squeeze=False)
        for img, axis in zip(data, axes.flatten()):
            axis.imshow(img)
            axis.axis("off")
        for axis in axes.flatten()[len(data):]:
            axis.axis("off")
        if savefile:
            fig.savefig(savefile)
        return fig


class UserMultiStep(UserSingleStep):
    """A fedAVG user: several local SGD steps, shares the parameter difference.

    The local loop is a `lax.scan` over precomputed per-step data slices — the
    functional analogue of the reference's optimizer loop (users.py:358-392).
    """

    def __init__(self, model, loss_fn, dataloader, setup, idx, cfg_user):
        super().__init__(model, loss_fn, dataloader, setup, idx, cfg_user)
        self.num_local_updates = int(cfg_user.num_local_updates)
        self.num_data_per_local_update_step = int(cfg_user.num_data_per_local_update_step)
        self.local_learning_rate = float(cfg_user.local_learning_rate)
        self.provide_local_hyperparams = bool(cfg_user.provide_local_hyperparams)
        self._multi_fn_cache = {}

    def __repr__(self):
        return (super().__repr__() +
                f"\n    Local steps: {self.num_local_updates}, data per step: "
                f"{self.num_data_per_local_update_step}, lr: {self.local_learning_rate} "
                f"(hyperparams shared: {self.provide_local_hyperparams})")

    def _make_multistep_fn(self, bn_train: bool):
        model, loss_fn = self.model, self.loss
        lr = self.local_learning_rate
        grad_noise, distribution = self.gradient_noise, self.noise_distribution
        clip_value = self.clip_value

        def step(carry, scan_in):
            params, buffers = carry
            inputs, labels, key = scan_in

            def task_loss(p):
                outputs, aux = model.apply(p, buffers, inputs, train=bn_train)
                return loss_fn(outputs, labels), aux
            (_, aux), grads = jax.value_and_grad(task_loss, has_aux=True)(params)
            if clip_value > 0:
                norm = _tree_global_norm(grads)
                factor = jnp.minimum(1.0, clip_value / (norm + 1e-6))
                grads = jax.tree_util.tree_map(lambda g: g * factor, grads)
            if grad_noise > 0:
                grads = _tree_add_noise(grads, key, grad_noise, distribution)
            params = jax.tree_util.tree_map(lambda p, g: p - lr * g, params, grads)
            new_buffers = aux.get("batch_stats", buffers)
            return (params, new_buffers), None

        def run(params, buffers, step_inputs, step_labels, keys):
            # exact-f32 matmuls for the victim's local steps (see UserSingleStep)
            with jax.default_matmul_precision("highest"):
                (final_params, final_buffers), _ = jax.lax.scan(
                    step, (params, buffers), (step_inputs, step_labels, keys))
            delta = jax.tree_util.tree_map(lambda a, b: a - b, final_params, params)
            return delta, final_buffers

        return jax.jit(run)

    def compute_local_updates(self, server_payload, custom_data=None):
        self.counted_queries += 1
        data = self._load_data() if custom_data is None else custom_data
        self.data_key = "input_ids" if "input_ids" in data else "inputs"

        parameters = server_payload["parameters"]
        buffers = server_payload["buffers"]
        bn_train = buffers is None and self.model.has_batchnorm
        local_buffers = buffers if buffers is not None else self.model.buffers

        # Cyclic per-step slices, matching the reference's modular indexing (users.py:362-366).
        per_step = self.num_data_per_local_update_step
        idx = np.arange(self.num_local_updates * per_step) % self.num_data_points
        idx = idx.reshape(self.num_local_updates, per_step)
        step_inputs = jnp.asarray(data[self.data_key])[idx]
        step_labels = jnp.asarray(data["labels"])[idx]

        from ..utils import split_key
        keys = jax.random.split(split_key(self.setup), self.num_local_updates)
        if bn_train not in self._multi_fn_cache:
            self._multi_fn_cache[bn_train] = self._make_multistep_fn(bn_train)
        delta, new_buffers = self._multi_fn_cache[bn_train](
            parameters, local_buffers, step_inputs, step_labels, keys)

        shared_buffers = new_buffers if self.model.has_batchnorm else None
        label_list = [np.sort(np.asarray(step_labels[i])) for i in range(self.num_local_updates)]
        metadata = dict(
            num_data_points=self.num_data_points if self.provide_num_data_points else None,
            labels=jnp.asarray(data["labels"]) if self.provide_labels else None,
            local_hyperparams=dict(
                lr=self.local_learning_rate,
                steps=self.num_local_updates,
                data_per_step=per_step,
                labels=label_list,
            ) if self.provide_local_hyperparams else None,
            data_key=self.data_key,
        )
        shared_data = dict(
            gradients=delta,
            buffers=shared_buffers if self.provide_buffers else None,
            metadata=metadata,
        )
        true_user_data = dict(data=jnp.asarray(data[self.data_key]),
                              labels=jnp.asarray(data["labels"]), buffers=shared_buffers)
        return shared_data, true_user_data


class MultiUserAggregate(UserMultiStep):
    """A secure-aggregation silo over a range of users (reference: users.py:431-533).

    The per-user updates are running-averaged; only the aggregate (as if produced
    by secure aggregation) is shared. On real multi-chip topologies the users
    shard across devices and the mean becomes a `jax.lax.pmean` over ICI — see
    breaching_tpu/parallel/ for the sharded variant.
    """

    def __init__(self, model, loss_fn, dataloaders, setup, user_indices, cfg_user):
        super().__init__(model, loss_fn, dataloaders[0], setup, user_indices[0], cfg_user)
        self.dataloaders = dataloaders
        self.user_indices = user_indices
        self.num_users = len(user_indices)
        self.user_idx = f"{user_indices[0]}-{user_indices[-1]}"

    def __repr__(self):
        return super().__repr__() + f"\n    Aggregating over {self.num_users} users."

    def compute_local_updates(self, server_payload, custom_data=None):
        """Aggregate per-user updates under reference threat-model semantics
        (reference users.py:463-533):

        - `num_data_points` is PER USER; every sub-user computes on the full
          configured count and the shared metadata reports
          `num_data_points * num_users` (reference users.py:510).
        - single-step silos (num_local_updates == 1) aggregate plain fedSGD
          gradients via UserSingleStep sub-users; multi-step silos aggregate
          fedAVG parameter deltas (reference users.py:448-453).
        - under provide_labels the silo shares `sort(concat(labels))`
          (reference users.py:511); under provide_local_hyperparams it shares
          the concatenation of every user's per-step label lists (reference
          users.py:502-504, 512-519); `num_users` is always shared
          (reference users.py:512).
        """
        self.counted_queries += 1
        single_step = self.num_local_updates == 1
        if single_step:
            # TPU-native path: ONE compiled program computes every user's
            # fedSGD gradient (vmap over the users axis; shard_map + pmean
            # over devices when the mesh allows) instead of the reference's
            # sequential per-user Python loop with CPU staging (reference
            # users.py:462-533). Math identical: mean of per-user gradients.
            return self._aggregate_singlestep_batched(server_payload)
        aggregate = None
        aggregate_buffers = None
        all_data, all_labels = [], []
        agg_label_lists = []

        for user_pos, (idx, loader) in enumerate(zip(self.user_indices, self.dataloaders)):
            sub_user = UserMultiStep(self.model, self.loss, loader, self.setup, idx, self.cfg)
            sub_user._multi_fn_cache = self._multi_fn_cache  # share compiled update
            shared, true = sub_user.compute_local_updates(server_payload)
            weight = 1.0 / (user_pos + 1)
            if aggregate is None:
                aggregate = shared["gradients"]
                aggregate_buffers = shared["buffers"]
            else:
                aggregate = jax.tree_util.tree_map(
                    lambda acc, g: acc + (g - acc) * weight, aggregate, shared["gradients"])
                if aggregate_buffers is not None and shared["buffers"] is not None:
                    aggregate_buffers = jax.tree_util.tree_map(
                        lambda acc, b: acc + (b - acc) * weight, aggregate_buffers, shared["buffers"])
            local_hp = shared["metadata"].get("local_hyperparams")
            if local_hp is not None and local_hp.get("labels") is not None:
                agg_label_lists.extend(local_hp["labels"])
            all_data.append(true["data"])
            all_labels.append(true["labels"])
            self.data_key = sub_user.data_key

        all_labels = jnp.concatenate(all_labels)
        metadata = dict(
            num_data_points=(self.num_data_points * self.num_users
                             if self.provide_num_data_points else None),
            labels=jnp.sort(all_labels) if self.provide_labels else None,
            num_users=self.num_users,
            local_hyperparams=dict(
                lr=self.local_learning_rate,
                steps=self.num_local_updates,
                data_per_step=self.num_data_per_local_update_step,
                labels=agg_label_lists,
            ) if self.provide_local_hyperparams else None,
            data_key=self.data_key,
        )
        shared_data = dict(gradients=aggregate, buffers=aggregate_buffers, metadata=metadata)
        true_user_data = dict(
            data=jnp.concatenate(all_data),
            labels=all_labels,
            buffers=aggregate_buffers,
        )
        return shared_data, true_user_data

    def _aggregate_singlestep_batched(self, server_payload):
        """Single-step silo as ONE compiled program (SURVEY §5 distributed
        plan): per-user batches stack on a leading users axis, `vmap` computes
        every user's fedSGD gradient (full DP semantics: per-user input/
        gradient noise keys, per-example clipping), and the secure-aggregation
        mean is a tree mean — or, when the users axis divides the device
        count, a shard_map with ONE `lax.pmean` over ICI (the TPU-native form
        of the reference's sequential loop + torch._foreach running mean,
        reference users.py:462-533; equality with the sequential path is
        pinned by tests/test_attack_matrix_holes.py)."""
        parameters = server_payload["parameters"]
        buffers = server_payload["buffers"]
        bn_train = buffers is None and self.model.has_batchnorm
        local_buffers = buffers if buffers is not None else self.model.buffers

        datas = []
        for idx, loader in zip(self.user_indices, self.dataloaders):
            sub = UserSingleStep(self.model, self.loss, loader, self.setup, idx, self.cfg)
            datas.append(sub._load_data())
        self.data_key = "input_ids" if "input_ids" in datas[0] else "inputs"
        inputs = jnp.stack([jnp.asarray(d[self.data_key]) for d in datas])
        labels = jnp.stack([jnp.asarray(d["labels"]) for d in datas])
        from ..utils import split_key
        keys = jax.random.split(split_key(self.setup), self.num_users)

        n_dev = jax.device_count()
        use_mesh = n_dev > 1 and self.num_users % n_dev == 0
        cache_key = ("agg", bn_train, self.clip_value > 0, use_mesh)
        if cache_key not in self._update_fn_cache:
            base = self._make_update_fn(bn_train, self.clip_value > 0)

            def batched(params, bufs, x, y, ks):
                # scan (not vmap) over users: memory stays ONE gradient tree
                # regardless of silo size (vmapping 1000 ResNet-18 users would
                # materialize 1000 gradient pytrees before the mean)
                def step(carry, scan_in):
                    gsum, bsum = carry
                    xi, yi, ki = scan_in
                    g, nb = base(params, bufs, xi, yi, ki)
                    return (jax.tree_util.tree_map(jnp.add, gsum, g),
                            jax.tree_util.tree_map(jnp.add, bsum, nb)), None

                zeros = lambda t: jax.tree_util.tree_map(jnp.zeros_like, t)
                (gsum, bsum), _ = jax.lax.scan(
                    step, (zeros(params), zeros(bufs)), (x, y, ks))
                n = x.shape[0]
                mean = lambda t: jax.tree_util.tree_map(lambda v: v / n, t)
                return mean(gsum), mean(bsum)

            if use_mesh:
                from jax.sharding import Mesh, PartitionSpec as P

                try:
                    from jax import shard_map
                except ImportError:  # pragma: no cover — older jax
                    from jax.experimental.shard_map import shard_map
                mesh = Mesh(np.asarray(jax.devices()), ("users",))

                def per_shard(params, bufs, x, y, ks):
                    # pvary: replicated args become device-varying before the
                    # local grad so the explicit pmean is the only collective
                    params = jax.tree_util.tree_map(
                        lambda p: jax.lax.pvary(p, ("users",)), params)
                    bufs = jax.tree_util.tree_map(
                        lambda b: jax.lax.pvary(b, ("users",)), bufs)
                    g, nb = batched(params, bufs, x, y, ks)
                    pm = lambda t: jax.tree_util.tree_map(
                        lambda v: jax.lax.pmean(v, "users"), t)
                    return pm(g), pm(nb)

                rep = jax.tree_util.tree_map(lambda _: P(), (parameters, local_buffers))
                fn = shard_map(per_shard, mesh=mesh,
                               in_specs=(rep[0], rep[1], P("users"), P("users"),
                                         P("users")),
                               out_specs=(jax.tree_util.tree_map(lambda _: P(), parameters),
                                          jax.tree_util.tree_map(lambda _: P(), local_buffers)))
                self._update_fn_cache[cache_key] = jax.jit(fn)
            else:
                self._update_fn_cache[cache_key] = jax.jit(batched)

        aggregate, new_buffers = self._update_fn_cache[cache_key](
            parameters, local_buffers, inputs, labels, keys)
        aggregate_buffers = new_buffers if (buffers is None and self.model.has_batchnorm) else None
        if aggregate_buffers is not None and not self.provide_buffers:
            shared_buffers = None
        else:
            shared_buffers = aggregate_buffers

        all_labels = labels.reshape(-1)
        metadata = dict(
            num_data_points=(self.num_data_points * self.num_users
                             if self.provide_num_data_points else None),
            labels=jnp.sort(all_labels) if self.provide_labels else None,
            num_users=self.num_users,
            local_hyperparams=dict(
                lr=self.local_learning_rate,
                steps=self.num_local_updates,
                data_per_step=self.num_data_per_local_update_step,
                labels=[],
            ) if self.provide_local_hyperparams else None,
            data_key=self.data_key,
        )
        shared_data = dict(gradients=aggregate, buffers=shared_buffers, metadata=metadata)
        true_user_data = dict(
            data=inputs.reshape(-1, *inputs.shape[2:]),
            labels=all_labels,
            buffers=aggregate_buffers,
        )
        return shared_data, true_user_data
