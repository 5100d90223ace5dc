"""Train a model in-repo and save it as a loadable checkpoint npz.

The reference gets "trained" models by downloading torchvision / timm / HF
checkpoints at construction time (reference model_preparation.py:170, 194-214).
This environment has no network egress, so `model_state: trained` would
otherwise silently keep random-init parameters — and untrained models are known
to leak far more, which makes optimization-attack parity rows incomparable.
This trainer closes that gap in-repo: it trains any case config's model on the
case's own (on-disk or synthetic) training split and writes
`<case.data.path>/checkpoints/<model-name>.npz` in the exact flat layout that
`tools/convert_checkpoint.py` produces and `_maybe_load_pretrained`
(model_preparation.py:251) consumes, so a subsequent
`case.server.pretrained=True` run attacks a genuinely trained model.

Usage:
    JAX_PLATFORMS=cpu python tools/train_model.py case=1_single_image_small \
        train.epochs=10 train.lr=0.05
    python simulate_breach.py case=1_single_image_small \
        attack=invertinggradients case.server.pretrained=True

train.* keys (consumed here, not part of the case config):
    epochs (10), lr (0.1), batch_size (128), weight_decay (5e-4),
    momentum (0.9), optimizer (sgd | adamw), limit (cap on training examples,
    0 = all), eval_batches (batches of the val split scored per epoch),
    out (explicit output path overriding the checkpoints/ convention),
    res (train at a reduced square resolution, 0 = the case's native shape).

`train.res` exists because the synthetic backend generates images on the
single-core host (~18 ms per 224-square image) — at ImageNet scale that makes
the input pipeline, not the TPU, the wall clock. ResNets/ConvNets with global
pooling are resolution-agnostic in their parameters, so training at e.g. 112
produces a checkpoint whose every leaf matches the 224-square attack model;
only the fc layer of flatten-style ConvNets pins the resolution (the trainer
errors on a shape mismatch at save-load time rather than guessing).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

import breaching_tpu as breaching
from breaching_tpu.cases.data.data_preparation import construct_dataloader
from breaching_tpu.cases.models.model_preparation import construct_model

TRAIN_DEFAULTS = dict(epochs=10, lr=0.1, batch_size=128, weight_decay=5e-4,
                      momentum=0.9, optimizer="sgd", limit=0, eval_batches=8,
                      out="", res=0, resume=0, materialize=1, device_aug=0,
                      mixup=0.0)


def dump_flat_state(model) -> dict:
    """Inverse of model_preparation.load_flat_state: pytrees -> flat npz dict."""
    flat = {}

    def put(tree, prefix):
        def rec(kp, leaf):
            key = prefix + "/".join(str(getattr(k, "key", k)) for k in kp)
            flat[key] = np.asarray(leaf)

        jax.tree_util.tree_map_with_path(rec, tree)

    put(model.params, "params/")
    put(model.buffers, "buffers/")
    return flat


def _batch_arrays(batch, modality):
    inputs = batch["input_ids" if modality == "text" else "inputs"]
    return jnp.asarray(inputs), jnp.asarray(batch["labels"])


def _materialize_vision(dataset) -> tuple:
    """Generate the whole (lazy) vision split once as uint8 [0,255] + labels.

    The synthetic backend costs ~3 ms/image on this 1-core host and the
    config-driven augmentations are seeded per-image (datasets_vision.py:87),
    i.e. identical every epoch — so paying generation once and training from
    the frozen arrays is semantically the same run, minus 100+ seconds of
    host datagen per epoch. Images are stored pre-normalization (uint8) to
    quarter the host->TPU transfer; normalization replays on device.
    """
    n = len(dataset)
    sample = dataset[0]["inputs"]
    imgs = np.empty((n,) + sample.shape, np.uint8)
    labels = np.empty((n,), np.int32)
    mean, std = dataset.mean, dataset.std
    t0 = time.time()
    for i in range(n):
        item = dataset[i]
        raw = item["inputs"] * std + mean  # invert the dataset's normalization
        imgs[i] = np.clip(np.rint(raw * 255.0), 0, 255).astype(np.uint8)
        labels[i] = item["labels"]
    print(f"Materialized {n} images in {time.time() - t0:.0f}s.", flush=True)
    return imgs, labels


def _apply_res(cfg_data, res: int) -> None:
    """Scale the data config to a reduced training resolution (see docstring)."""
    cfg_data.shape = [int(cfg_data.shape[0]), res, res]
    for aug_key in ("augmentations_train", "augmentations_val"):
        aug = cfg_data.get(aug_key)
        if not aug:
            continue
        for name in list(aug.keys()):
            if name in ("RandomResizedCrop", "CenterCrop"):
                aug[name] = res
            elif name == "Resize":
                aug[name] = round(res * 256 / 224)
            elif name == "RandomCrop":
                pad = aug[name][1] if isinstance(aug[name], (list, tuple)) else 0
                aug[name] = [res, pad]


def train(cfg, tr) -> str:
    cfg_data = cfg.case.data
    cfg_data.examples_from_split = "training"
    cfg_data.batch_size = int(tr["batch_size"])
    # partition=none => the full split, like the reference's central training
    cfg_data.partition = "none"
    if tr["res"]:
        _apply_res(cfg_data, int(tr["res"]))

    loader = construct_dataloader(cfg_data, cfg.case.impl, user_idx=0,
                                  return_full_dataset=True)
    if tr["limit"]:
        loader.dataset = loader.dataset.subset(
            np.arange(min(int(tr["limit"]), len(loader.dataset))))
    loader.shuffle = True

    model, loss_fn = construct_model(cfg.case.model, cfg_data)
    modality = model.modality

    steps_per_epoch = max(len(loader), 1)
    schedule = optax.cosine_decay_schedule(
        float(tr["lr"]), int(tr["epochs"]) * steps_per_epoch)
    if str(tr["optimizer"]) == "adamw":
        tx = optax.adamw(schedule, weight_decay=float(tr["weight_decay"]))
    else:
        tx = optax.chain(
            optax.add_decayed_weights(float(tr["weight_decay"])),
            optax.sgd(schedule, momentum=float(tr["momentum"]), nesterov=True))
    opt_state = tx.init(model.params)

    @jax.jit
    def step(params, buffers, opt_state, inputs, labels):
        def objective(p):
            logits, aux = model.apply(p, buffers, inputs, train=True)
            return loss_fn(logits, labels), aux

        (loss, aux), grads = jax.value_and_grad(objective, has_aux=True)(params)
        updates, opt_state_ = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, aux.get("batch_stats", buffers), opt_state_, loss

    @jax.jit
    def update_stats(params, buffers, inputs):
        _, aux = model.apply(params, buffers, inputs, train=True)
        return aux.get("batch_stats", buffers)

    init_buffers = model.buffers

    def recalibrate(params, batches=16):
        """Re-estimate BN running statistics under the *current* weights.

        The BatchNorm layers keep cumulative (momentum=None) running averages —
        the attack-time semantics the reference forces (cases/users.py:140-143).
        Accumulated across a whole training run that weighs epoch-1 activation
        statistics (random weights) equally with final-epoch ones, which makes
        eval-mode normalization useless. So: reset to the fresh-init statistics
        and cumulatively average `batches` training batches with the trained
        weights — the exact mean of those batch statistics.
        """
        if not jax.tree_util.tree_leaves(init_buffers):
            return init_buffers
        fresh = init_buffers
        for batch, _ in zip(loader, range(batches)):
            inputs, _ = _batch_arrays(batch, modality)
            fresh = update_stats(params, fresh, inputs)
        return fresh

    @jax.jit
    def score(params, buffers, inputs, labels):
        logits, _ = model.apply(params, buffers, inputs, train=False)
        if logits.ndim == 3:  # causal LM: next-token accuracy
            hits = jnp.argmax(logits[:, :-1], -1) == labels[:, 1:]
        else:
            hits = jnp.argmax(logits, -1) == labels
        return hits.mean()

    params, buffers = model.params, model.buffers
    val_loader = None
    if tr["eval_batches"]:
        import copy

        cfg_val = copy.deepcopy(cfg_data)
        cfg_val.examples_from_split = "validation"
        val_loader = construct_dataloader(cfg_val, cfg.case.impl, user_idx=0,
                                          return_full_dataset=True)

    # Materialized on-device path (vision): whole split as device-resident
    # uint8, each epoch one jitted scan — removes the ~3 ms/img host datagen
    # from every epoch and all per-step host->TPU transfers.
    mat = bool(tr["materialize"]) and modality == "vision"
    aug_dev = bool(tr["device_aug"]) and mat
    batch = int(tr["batch_size"])
    if mat:
        imgs_np, labels_np = _materialize_vision(loader.dataset)
        steps_per_epoch = max(len(imgs_np) // batch, 1)
        mean_c = jnp.asarray(loader.dataset.mean, jnp.float32)
        std_c = jnp.asarray(loader.dataset.std, jnp.float32)

        def norm(x_u8):
            return (x_u8.astype(jnp.float32) / 255.0 - mean_c) / std_c

        def _augment(x_u8, key):
            # Fresh random flip + shifted crop per epoch. The host-side
            # config augmentations are seeded per-image (identical every
            # epoch — see _materialize_vision), so without this the model
            # never sees a second view of any example and memorizes.
            n, h, w, c = x_u8.shape
            kf, ks = jax.random.split(key)
            flip = jax.random.bernoulli(kf, shape=(n,))
            x = jnp.where(flip[:, None, None, None], x_u8[:, :, ::-1, :], x_u8)
            pad = max(h // 16, 2)
            xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")
            offs = jax.random.randint(ks, (n, 2), 0, 2 * pad + 1)
            crop = lambda img, off: jax.lax.dynamic_slice(
                img, (off[0], off[1], 0), (h, w, c))
            return jax.vmap(crop)(xp, offs)

        mix_alpha = float(tr["mixup"])

        @jax.jit
        def step_mix(params, buffers, opt_state, inputs, y1, y2, lam):
            # mixup with integer labels: convex combination of the two CEs
            def objective(p):
                logits, aux = model.apply(p, buffers, inputs, train=True)
                return (lam * loss_fn(logits, y1)
                        + (1 - lam) * loss_fn(logits, y2)), aux
            (loss, aux), grads = jax.value_and_grad(objective, has_aux=True)(params)
            updates, opt_state_ = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, aux.get("batch_stats", buffers), opt_state_, loss

        @jax.jit
        def run_epoch(params, buffers, opt_state, data, labels_all, idxs, key):
            keys = jax.random.split(key, idxs.shape[0])
            def body(carry, xs):
                idx, k = xs
                params, buffers, opt_state, loss_sum = carry
                x = data[idx]
                if aug_dev:
                    x = _augment(x, k)
                y = labels_all[idx]
                if mix_alpha > 0:
                    lam = jax.random.beta(jax.random.fold_in(k, 1),
                                          mix_alpha, mix_alpha)
                    lam = jnp.maximum(lam, 1 - lam)  # keep y1 the major label
                    xf = norm(x)
                    p, b, o, loss = step_mix(
                        params, buffers, opt_state,
                        lam * xf + (1 - lam) * xf[::-1], y, y[::-1], lam)
                else:
                    p, b, o, loss = step(params, buffers, opt_state, norm(x), y)
                return (p, b, o, loss_sum + loss), None
            carry, _ = jax.lax.scan(
                body, (params, buffers, opt_state, jnp.float32(0)), (idxs, keys))
            return carry

        @jax.jit
        def recal_dev(params, data, idxs):
            def body(bufs, idx):
                return update_stats(params, bufs, norm(data[idx])), None
            bufs, _ = jax.lax.scan(body, init_buffers, idxs)
            return bufs

        @jax.jit
        def score_u8(params, buffers, x_u8, labels):
            return score(params, buffers, norm(x_u8), labels)

        data_dev = jax.device_put(imgs_np)
        labels_dev = jax.device_put(labels_np)
        val_dev = None
        if val_loader is not None:
            n_eval = min(len(val_loader.dataset), int(tr["eval_batches"]) * batch)
            val_imgs, val_labels = _materialize_vision(
                val_loader.dataset.subset(np.arange(n_eval)))
            val_dev = (jax.device_put(val_imgs), jax.device_put(val_labels))

    out = str(tr["out"]) or os.path.expanduser(
        os.path.join(str(cfg_data.path), "checkpoints", f"{model.name}.npz"))
    os.makedirs(os.path.dirname(out), exist_ok=True)

    if tr["resume"] and os.path.exists(out):
        # continue an interrupted run from its last per-epoch save (fresh
        # optimizer state; the cosine schedule restarts at train.lr)
        from breaching_tpu.cases.models.model_preparation import load_flat_state

        replaced = load_flat_state(model, dict(np.load(out)), strict=True)
        params, buffers = model.params, model.buffers
        print(f"Resumed {replaced} tensors from {out}.", flush=True)

    print(f"Training {model.name} on {loader.name} "
          f"({len(loader.dataset)} examples, {steps_per_epoch} steps/epoch).",
          flush=True)
    shuffle_rng = np.random.default_rng(0)
    for epoch in range(int(tr["epochs"])):
        t0 = time.time()
        if mat:
            perm = shuffle_rng.permutation(len(imgs_np))[: steps_per_epoch * batch]
            idxs = jnp.asarray(perm.reshape(steps_per_epoch, batch), jnp.int32)
            params, buffers, opt_state, loss_sum = run_epoch(
                params, buffers, opt_state, data_dev, labels_dev, idxs,
                jax.random.PRNGKey(epoch))
            buffers = recal_dev(params, data_dev, idxs[: min(16, steps_per_epoch)])
            mean_loss = float(loss_sum) / steps_per_epoch
        else:
            loader.seed = epoch  # reshuffle deterministically per epoch
            losses = []
            for b in loader:
                inputs, labels = _batch_arrays(b, modality)
                params, buffers, opt_state, loss = step(
                    params, buffers, opt_state, inputs, labels)
                losses.append(float(loss))
            buffers = recalibrate(params)
            mean_loss = float(np.mean(losses))
        msg = (f"epoch {epoch + 1}/{tr['epochs']}: loss {mean_loss:.4f} "
               f"({time.time() - t0:.1f}s)")
        if mat and val_dev is not None:
            vi, vl = val_dev
            accs = [float(score_u8(params, buffers, vi[i:i + batch], vl[i:i + batch]))
                    for i in range(0, len(vl), batch)]
            msg += f", val acc {np.mean(accs):.4f}"
        elif val_loader is not None:
            accs = [float(score(params, buffers, *_batch_arrays(b, modality)))
                    for b, _ in zip(val_loader, range(int(tr["eval_batches"])))]
            msg += f", val acc {np.mean(accs):.4f}"
        print(msg, flush=True)
        # checkpoint every epoch so an interrupted run still yields a model
        model.params, model.buffers = params, buffers
        np.savez(out, **dump_flat_state(model))

    print(f"Saved trained checkpoint to {out} "
          f"(load with case.server.pretrained=True).")
    return out


def main():
    tr = dict(TRAIN_DEFAULTS)
    case_overrides = []
    for ov in sys.argv[1:]:
        key, _, val = ov.partition("=")
        if key.startswith("train."):
            name = key[len("train."):]
            if name not in tr:
                raise SystemExit(f"Unknown train key '{name}'; "
                                 f"known: {sorted(tr)}")
            tr[name] = type(TRAIN_DEFAULTS[name])(val) if name != "out" else val
        else:
            case_overrides.append(ov)
    cfg = breaching.get_config(case_overrides)
    train(cfg, tr)


if __name__ == "__main__":
    main()
