"""Attack-quality reporting (reference: breaching/analysis/analysis.py:14-107).

Dispatches vision vs. text metrics, computes label accuracy, and the feature-space
MSE through the payload model. All heavy tensor work runs on-device; only tiny
assignment solves run on host.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from . import metrics as M
from .dtcwt import dtcwt_cw_ssim

log = logging.getLogger(__name__)


def report(reconstructed_user_data, true_user_data, server_payload, model,
           order_batch=True, compute_full_iip=False, cfg_case=None, setup=None,
           loss_fn=None):
    metadata = server_payload[0]["metadata"]
    if metadata.modality == "vision":
        test_metrics = _run_vision_metrics(
            reconstructed_user_data, true_user_data, server_payload, model,
            order_batch, compute_full_iip, cfg_case)
    else:
        test_metrics = _run_text_metrics(
            reconstructed_user_data, true_user_data, server_payload, model, order_batch)

    test_metrics["label_acc"] = _label_accuracy(reconstructed_user_data, true_user_data, metadata)
    test_metrics.update(_feature_space_mse(
        reconstructed_user_data, true_user_data, server_payload, model))
    test_metrics["parameters"] = int(sum(
        x.size for x in jax.tree_util.tree_leaves(model.params)))

    if metadata.modality == "vision":
        log.info(
            f"METRICS: | MSE: {test_metrics['mse']:2.4f} | PSNR: {test_metrics['psnr']:4.2f} | "
            f"FMSE: {test_metrics['feat_mse']:2.4e} | LPIPS: {test_metrics.get('lpips', float('nan')):4.2f} | "
            f"R-PSNR: {test_metrics['rpsnr']:4.2f} | SSIM: {test_metrics['ssim']:2.4f} | "
            f"Label Acc: {test_metrics['label_acc']:2.2%}")
    else:
        log.info(
            f"METRICS: | Accuracy: {test_metrics['accuracy']:2.4f} | "
            f"S-BLEU (local): {test_metrics.get('sacrebleu', float('nan')):4.2f} | "
            f"Token Acc: {test_metrics.get('token_acc', float('nan')):2.2%} | "
            f"Label Acc: {test_metrics['label_acc']:2.2%}")
    return test_metrics


def _run_vision_metrics(rec_data, true_data, server_payload, model,
                        order_batch, compute_full_iip, cfg_case):
    metadata = server_payload[0]["metadata"]
    dm = jnp.asarray(metadata.mean, jnp.float32).reshape(1, 1, 1, -1)
    ds = jnp.asarray(metadata.std, jnp.float32).reshape(1, 1, 1, -1)

    rec = jnp.asarray(rec_data["data"], jnp.float32)
    ref = jnp.asarray(true_data["data"], jnp.float32)
    rec_den = jnp.clip(rec * ds + dm, 0, 1)
    ref_den = jnp.clip(ref * ds + dm, 0, 1)

    # LPIPS scorer: available whenever converted weights exist on disk
    # (<data.path>/checkpoints/lpips_alex.npz or $BREACHING_LPIPS_WEIGHTS);
    # NaN otherwise. Reference: analysis.py:217-219 and lpips-based batch
    # ordering at analysis.py:332-375.
    from .lpips import load_lpips

    lpips_scorer = load_lpips(cfg_case)

    if order_batch and rec.shape[0] == ref.shape[0] and rec.shape[0] > 1:
        order = M.compute_batch_order(np.asarray(rec_den), np.asarray(ref_den),
                                      lpips_scorer=lpips_scorer)
        rec, rec_den = rec[order], rec_den[order]
        if rec_data.get("labels") is not None and len(np.asarray(rec_data["labels"]).shape) > 0:
            rec_data = dict(rec_data, labels=jnp.asarray(rec_data["labels"])[order])
        rec_data["data"] = rec
        rec_data["order"] = order

    mse, psnr = M.mse_psnr(rec_den, ref_den, factor=1.0, clip=True)
    out = dict(
        mse=float(mse),
        psnr=float(psnr),
        ssim=float(M.ssim(rec_den, ref_den)),
        # Real dual-tree complex wavelet CW-SSIM (reference metrics.py:11-55,
        # pytorch_wavelets near_sym_b/qshift_b) — native JAX implementation,
        # filter constants validated algebraically in tests/test_dtcwt.py.
        cw_ssim=float(dtcwt_cw_ssim(rec_den, ref_den)),
        # Retained fallback/diagnostic: CW-SSIM's index formula over a Gabor
        # bank instead of the DTCWT. Absolute values are NOT comparable to
        # cw_ssim — golden values in tests/test_aux_subsystems.py.
        gabor_cw_ssim=float(M.cw_ssim(rec_den, ref_den)),
        rpsnr=float(M.registered_psnr(rec_den, ref_den)),
        max_mse=float(jnp.max(jnp.mean(jnp.square(rec_den - ref_den),
                                       axis=tuple(range(1, rec.ndim))))),
        # NaN only when no converted LPIPS weights exist on disk (zero-egress
        # environments cannot fetch the Zhang et al. calibration); see lpips.py.
        lpips=(float(jnp.mean(lpips_scorer(rec_den, ref_den)))
               if lpips_scorer is not None else float("nan")),
        order=rec_data.get("order"),
    )

    if compute_full_iip and cfg_case is not None:
        out.update(_compute_iip(rec_den, ref_den, cfg_case, model=model,
                                lpips_scorer=lpips_scorer))
    return out


def _compute_iip(rec_den, ref_den, cfg_case, model=None, scores=("pixel", "self", "lpips"),
                 lpips_scorer=None, pool_cap=None):
    """IIP in pixel space, the attacked model's own feature space (the
    reference's 'self' scorer), and LPIPS feature space when weights exist
    (reference metrics.py:245-295). `pool_cap` limits the decoy pool; the
    reference uses the full validation set — set cfg_case.impl.iip_pool_cap=0
    for that behavior (default 256 keeps the 1-core runner fast)."""
    from ..cases.data import construct_dataloader

    if pool_cap is None:
        pool_cap = int(getattr(cfg_case.impl, "iip_pool_cap", 256) or 0) \
            if hasattr(cfg_case, "impl") else 256
    loader = construct_dataloader(cfg_case.data, cfg_case.impl,
                                  user_idx=0, return_full_dataset=True)
    dm = np.asarray(cfg_case.data.mean, np.float32)
    ds = np.asarray(cfg_case.data.std, np.float32)
    pool = []
    for batch in loader:
        pool.append(batch["inputs"])
        if pool_cap and sum(p.shape[0] for p in pool) >= pool_cap:
            break
    pool = np.concatenate(pool)
    if pool_cap:
        pool = pool[:pool_cap]
    pool_den = np.clip(pool * ds + dm, 0, 1)
    out = {}
    if "pixel" in scores:
        out["IIP-pixel"] = float(M.image_identifiability_precision(
            rec_den, ref_den, jnp.asarray(pool_den)))
    if "lpips" in scores and lpips_scorer is not None:
        out["IIP-lpips"] = float(M.image_identifiability_precision(
            lpips_scorer.features(rec_den), lpips_scorer.features(ref_den),
            lpips_scorer.features(jnp.asarray(pool_den))))
    if "self" in scores and model is not None:
        from ..attacks.auxiliaries.regularizers import _find_sown

        @jax.jit
        def _feats(p, b, x):
            # params as jit args, not baked constants (see _feature_space_mse)
            _, aux = model.apply(p, b, (x - dm) / ds, train=False, capture=True)
            f = _find_sown(aux.get("intermediates", {}), "features")
            return f.reshape(x.shape[0], -1)

        def feats(x):
            return _feats(model.params, model.buffers, x)

        try:
            out["IIP-self"] = float(M.image_identifiability_precision(
                feats(rec_den), feats(ref_den), feats(jnp.asarray(pool_den))))
        except (TypeError, AttributeError):  # model without sown features
            pass
    return out


def _run_text_metrics(rec_data, true_data, server_payload, model, order_batch):
    from .text_metrics import run_text_metrics

    return run_text_metrics(rec_data, true_data, server_payload, model, order_batch)


def _label_accuracy(rec_data, true_data, metadata):
    """Multiset label overlap via bincount (reference: analysis.py:282-312)."""
    rec_labels = rec_data.get("labels")
    true_labels = true_data.get("labels")
    if rec_labels is None or true_labels is None:
        return float("nan")
    rec_labels = np.asarray(rec_labels).reshape(-1)
    true_labels = np.asarray(true_labels).reshape(-1)
    # masked-lm labels carry an ignore index (-100) on unmasked positions
    rec_labels = rec_labels[rec_labels >= 0]
    true_labels = true_labels[true_labels >= 0]
    num_classes = int(max(rec_labels.max(initial=0), true_labels.max(initial=0))) + 1
    overlap = np.minimum(
        np.bincount(rec_labels, minlength=num_classes),
        np.bincount(true_labels, minlength=num_classes)).sum()
    return float(overlap / max(len(true_labels), 1))


def _feature_space_mse(rec_data, true_data, server_payload, model):
    """MSE between pre-head features of reconstruction and truth through the
    payload model (reference: analysis.py:57-76)."""
    params = jax.tree_util.tree_map(jnp.asarray, server_payload[0]["parameters"])
    buffers = server_payload[0]["buffers"] or model.buffers

    # params/buffers enter as jit ARGUMENTS: closing over them would bake
    # ~100MB of weights into the HLO as constants, which the axon remote
    # compiler rejects (HTTP 413) for ViT/ResNet-50-sized payload models.
    @jax.jit
    def _features(p, b, x):
        _, aux = model.apply(p, b, x, train=False, capture=True)
        inter = aux.get("intermediates", {})
        from ..attacks.auxiliaries.regularizers import _find_sown

        return _find_sown(inter, "features")

    def features_of(x):
        return _features(params, buffers, x)

    def as_model_input(x):
        arr = jnp.asarray(x)
        # text token ids must stay integral — a float array is read as embeddings
        return arr if jnp.issubdtype(arr.dtype, jnp.integer) else arr.astype(jnp.float32)

    rec_feats = features_of(as_model_input(rec_data["data"]))
    true_feats = features_of(as_model_input(true_data["data"]))
    if rec_feats is None or true_feats is None:
        return dict(feat_mse=float("nan"))
    return dict(feat_mse=float(jnp.mean(jnp.square(rec_feats - true_feats))))
