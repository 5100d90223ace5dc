"""Malicious servers: model-modifying, transformer-rewiring, parameter-fishing.

TPU-native counterpart of reference breaching/cases/servers.py:171-895. Model
surgery here is functional composition: instead of splicing a torch Module into a
module list (reference `_place_malicious_block`, servers.py:240-278), the server
builds a wrapper flax module (imprint block in front of the victim) and re-binds
the JaxModel around it. Secrets record *pytree paths* of the malicious
parameters, which the imprint readout consumes directly — no positional
gradient-index bookkeeping.
"""

from __future__ import annotations

import dataclasses
import logging

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..servers import HonestServer
from . import imprint as imprint_blocks

log = logging.getLogger(__name__)


class ImprintedModel(nn.Module):
    """Wrapper: malicious block runs on the input, victim model on its output."""

    block: nn.Module
    victim: nn.Module

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = self.block(x, train=train)
        return self.victim(x, train=train)


class MaliciousModelServer(HonestServer):
    """"Robbing the Fed" / "Curious Abandon Honesty" server: inserts an imprint
    block in front of the model (reference: servers.py:171-381)."""

    THREAT = "Malicious (analyst)"
    CANDIDATE_BLOCKS = dict(
        ImprintBlock=imprint_blocks.ImprintBlock,
        SparseImprintBlock=imprint_blocks.SparseImprintBlock,
        OneShotBlock=imprint_blocks.OneShotBlock,
        OneShotBlockSparse=imprint_blocks.OneShotBlockSparse,
        CuriousAbandonHonesty=imprint_blocks.CuriousAbandonHonesty,
    )

    def __init__(self, model, loss_fn, cfg_case, setup, external_dataloader=None):
        super().__init__(model, loss_fn, cfg_case, setup, external_dataloader)
        self.original_model = model

    def vet_model(self, model):
        """Place the malicious block and record its secrets."""
        cfg_mod = self.cfg_server.model_modification
        block_cls = self.CANDIDATE_BLOCKS[cfg_mod.type]
        modality = self.cfg_data.modality
        if modality == "vision":
            c, h, w = self.cfg_data.shape
            data_shape = (h, w, c)  # NHWC
        else:
            # text: the block sits after the embedding, on (seq, embed_dim)
            data_shape = (int(self.cfg_data.shape[0]), int(model.aux["ninp"]))

        kwargs = dict(num_bins=int(cfg_mod.num_bins), connection=cfg_mod.get("connection", "linear"))
        for field in ("gain", "linfunc", "mode", "mu", "sigma", "scale_factor", "target_val"):
            if cfg_mod.get(field) is not None and field in {f.name for f in dataclasses.fields(block_cls)}:
                kwargs[field] = cfg_mod[field]
        block = block_cls(data_shape=data_shape, **kwargs)

        if modality == "text":
            return self._vet_text_model(model, block, data_shape)

        if cfg_mod.get("position") is not None:
            return self._vet_resnet_deep(model, block_cls, kwargs, cfg_mod)

        wrapped = ImprintedModel(block=block, victim=model.module)
        new_model = dataclasses.replace(
            model, module=wrapped, name=model.name,
            head_path=("victim",) + tuple(model.head_path))
        variables = wrapped.init(jax.random.PRNGKey(0), model.input_example, train=False)
        new_params = dict(variables["params"])
        # keep the victim's (possibly pretrained) parameters
        new_params["victim"] = model.params
        new_model.params = new_params
        new_model.buffers = ({"victim": model.buffers} if model.buffers else {})

        if float(self.cfg_server.get("model_gain", 1.0)) != 1.0:
            gain = float(self.cfg_server.model_gain)
            new_model.params["victim"] = jax.tree_util.tree_map(
                lambda p: p * gain, new_model.params["victim"])

        self.secrets["ImprintBlock"] = dict(
            weight_path=("block", "linear0_kernel"),
            bias_path=("block", "linear0_bias"),
            shape=data_shape,
            structure=block.structure,
        )
        if cfg_mod.get("handle_preceding_layers") == "VAE":
            # deeper placements need a decoder back to input space
            # (reference: servers.py:368-381 trains a VAE for this)
            from .aux_training import train_encoder_decoder

            decode, _ = train_encoder_decoder(
                data_shape, dataloader=self.external_dataloader, steps=200,
                arch=str(cfg_mod.get("aux_arch") or "VAE"))
            self.secrets["ImprintBlock"]["decoder"] = decode
        self.model = new_model
        self.loss = self.loss  # unchanged
        for _ in range(int(self.cfg_server.get("normalize_rounds", 0) or 0)):
            self._normalize_throughput(
                new_model, gain=float(self.cfg_server.get("model_gain", 1.0) or 1.0))
        return new_model

    def _vet_resnet_deep(self, model, block_cls, block_kwargs, cfg_mod):
        """Deeper imprint placement inside a ResNet (reference
        _place_malicious_block, servers.py:240-278): the block runs before stage
        `position`; handle_preceding_layers='identity' linearizes the prefix to
        an (approximate) identity map (reference _linearize_up_to_imprint,
        servers.py:280-312), so the readout recovers downscaled images directly.
        """
        from ..models.resnets import ResNet

        module = model.module
        if not isinstance(module, ResNet):
            raise ValueError(
                f"Deep imprint placement is implemented for the flax ResNet family "
                f"(got {model.name}).")
        position = int(cfg_mod.position)
        handle = cfg_mod.get("handle_preceding_layers") or "identity"

        # feature-map shape entering stage `position`
        c, h, w = self.cfg_data.shape
        fh, fw = (h // 4, w // 4) if module.stem == "ImageNet" else (h, w)
        feats = module.width
        for s in range(position):
            stride = module.strides[s]
            fh, fw = -(-fh // stride), -(-fw // stride)
            mult = 4 if module.block == "bottleneck" else 1
            feats = module.width * (2 ** s) * mult
        data_shape = (fh, fw, feats)

        block = block_cls(data_shape=data_shape, **block_kwargs)
        new_module = module.clone(imprint_block=block, imprint_position=position,
                                  linear_prefix=(handle == "identity"))
        new_model = dataclasses.replace(model, module=new_module)
        variables = new_module.init(jax.random.PRNGKey(0), model.input_example, train=False)
        new_params = dict(variables["params"])
        for key, val in model.params.items():
            new_params[key] = val
        new_model.params = new_params
        new_model.buffers = dict(model.buffers) if model.buffers else {}

        if handle == "identity":
            self._linearize_prefix(new_model, module, position)

        self.secrets["ImprintBlock"] = dict(
            weight_path=("imprint_block", "linear0_kernel"),
            bias_path=("imprint_block", "linear0_bias"),
            shape=data_shape,
            structure=block.structure,
        )
        if handle == "VAE":
            # train a decoder against the ACTUAL prefix feature map: tap the
            # imprint block's input on the unmodified victim and fit
            # D(prefix(x)) ~= x (reference feat_decoders.py + VAE.py)
            from flax import linen as nn

            from .aux_training import train_feature_decoder

            class _Tap(nn.Module):
                @nn.compact
                def __call__(self, x, train=False):
                    self.sow("intermediates", "prefix_features", x)
                    return x

            tap_module = module.clone(imprint_block=_Tap(),
                                      imprint_position=position,
                                      linear_prefix=False)
            victim_params, victim_buffers = model.params, model.buffers

            def prefix_fn(x):
                variables = {"params": victim_params}
                if victim_buffers:
                    variables["batch_stats"] = victim_buffers
                _, inter = tap_module.apply(variables, x, train=False,
                                            mutable=["intermediates"])
                return dict(inter)["intermediates"]["imprint_block"][
                    "prefix_features"][0]

            decode, _ = train_feature_decoder(
                prefix_fn, (h, w, c), data_shape,
                dataloader=self.external_dataloader)
            self.secrets["ImprintBlock"]["decoder"] = decode
        self.model = new_model
        return new_model

    def _linearize_prefix(self, model, module, position):
        """Parameter edits making the pre-block ResNet prefix an identity map
        (reference: _linearize_up_to_imprint, servers.py:280-312): first conv ->
        channel-replicated dirac, other prefix convs -> zero (residuals carry the
        signal), prefix norms -> identity."""
        params = jax.tree_util.tree_map(lambda x: np.array(x, copy=True), model.params)
        buffers = jax.tree_util.tree_map(lambda x: np.array(x, copy=True), model.buffers or {})

        def dirac_replicated(kernel):
            kh, kw, cin, cout = kernel.shape
            new = np.zeros_like(kernel)
            for co in range(cout):
                new[kh // 2, kw // 2, co % cin, co] = 1.0
            return new

        def identity_norm(name):
            if name in params and "scale" in params[name]:
                params[name]["scale"] = np.ones_like(params[name]["scale"])
                params[name]["bias"] = np.zeros_like(params[name]["bias"])
            if name in buffers and "mean" in buffers.get(name, {}):
                buffers[name]["mean"] = np.zeros_like(buffers[name]["mean"])
                buffers[name]["var"] = np.ones_like(buffers[name]["var"])

        params["stem_conv"]["conv"]["kernel"] = dirac_replicated(
            params["stem_conv"]["conv"]["kernel"])
        identity_norm("stem_norm")
        for s in range(position):
            for name in list(params.keys()):
                if not name.startswith(f"stage{s}_block"):
                    continue
                blockp = params[name]
                for conv_name in ("conv1", "conv2", "conv3"):
                    if conv_name in blockp:
                        blockp[conv_name]["conv"]["kernel"] = np.zeros_like(
                            blockp[conv_name]["conv"]["kernel"])
                if "downsample_conv" in blockp:
                    blockp["downsample_conv"]["conv"]["kernel"] = dirac_replicated(
                        blockp["downsample_conv"]["conv"]["kernel"])
                for norm_name in ("bn1", "bn2", "bn3", "downsample_norm"):
                    if norm_name in blockp:
                        blockp[norm_name]["scale"] = np.ones_like(blockp[norm_name]["scale"])
                        blockp[norm_name]["bias"] = np.zeros_like(blockp[norm_name]["bias"])
                    if name in buffers and norm_name in buffers[name]:
                        buffers[name][norm_name]["mean"] = np.zeros_like(
                            buffers[name][norm_name]["mean"])
                        buffers[name][norm_name]["var"] = np.ones_like(
                            buffers[name][norm_name]["var"])
        model.params = jax.tree_util.tree_map(jnp.asarray, params)
        model.buffers = jax.tree_util.tree_map(jnp.asarray, buffers) if buffers else {}

    def _vet_text_model(self, model, block, data_shape):
        """Rebuild the transformer with the imprint block after its embedding
        (the functional counterpart of the reference's deeper `position`
        placement for text, servers.py:240-278)."""
        from ..models.language_models import TransformerModel

        if not isinstance(model.module, TransformerModel):
            raise ValueError(
                f"Text imprint placement is implemented for the flax TransformerModel "
                f"family (got {model.name}).")
        module = model.module.clone(imprint_block=block)
        new_model = dataclasses.replace(model, module=module)
        variables = module.init(jax.random.PRNGKey(0), model.input_example, train=False)
        new_params = dict(variables["params"])
        for key, val in model.params.items():  # keep the victim's parameters
            new_params[key] = val
        new_model.params = new_params
        new_model.buffers = model.buffers

        self.secrets["ImprintBlock"] = dict(
            weight_path=("imprint_block", "linear0_kernel"),
            bias_path=("imprint_block", "linear0_bias"),
            shape=data_shape,
            structure=block.structure,
        )
        self.model = new_model
        return new_model

    def _probe_batch(self):
        if self.external_dataloader is not None:
            return jnp.asarray(next(iter(self.external_dataloader))["inputs"][:8])
        c, h, w = self.cfg_data.shape
        return jax.random.normal(jax.random.PRNGKey(7),
                                 (int(self.cfg_data.batch_size or 8), h, w, c))

    def _normalize_throughput(self, model, gain=1.0, bn_modeset=False):
        """Reset each layer's activation throughput to zero mean / `gain` std
        (reference: servers.py:314-366). Walks every scale/bias-carrying layer
        (norms, biased convs/denses) in forward execution order — captured via
        flax `capture_intermediates` in place of torch forward hooks — measures
        its output statistics on a probe batch, folds `scale /= std/gain`,
        `bias -= mu/(std/gain)` into the parameters, and re-probes before the
        next layer. Bias-less downsample convs are zeroed like the reference's
        `downsample.0`. This is what lets CAH/RtF imprint blocks survive
        realistic victim models without saturating later activations."""
        x = self._probe_batch()
        params = jax.tree_util.tree_map(np.array, model.params)

        def apply_with_capture(p):
            variables = {"params": p}
            if model.buffers:
                variables["batch_stats"] = model.buffers
            if bn_modeset:  # reference's BN-statistics-only mode
                _, updated = model.module.apply(
                    variables, x, train=True, mutable=["batch_stats"])
                return None, dict(updated)
            _, inter = model.module.apply(
                variables, x, train=False, mutable=["intermediates"],
                capture_intermediates=lambda mdl, name: name == "__call__")
            return dict(inter)["intermediates"], None

        if bn_modeset:
            _, updated = apply_with_capture(params)
            model.buffers = updated.get("batch_stats", model.buffers)
            return

        # layer order = execution order (flax preserves capture insertion order)
        def walk(tree, prefix=()):
            order = []
            for key, val in tree.items():
                if isinstance(val, dict):
                    order.extend(walk(val, prefix + (key,)))
                elif key == "__call__":
                    order.append(prefix)
            return order

        intermediates = apply_with_capture(params)[0]
        execution_order = walk(intermediates)

        def param_node(path):
            node = params
            for key in path:
                if not isinstance(node, dict) or key not in node:
                    return None
                node = node[key]
            return node if isinstance(node, dict) else None

        for path in execution_order:
            node = param_node(path)
            if node is None:
                continue
            is_downsample = any("downsample" in str(k) for k in path)
            if "kernel" in node and "bias" not in node and is_downsample \
                    and getattr(node["kernel"], "ndim", 0) == 4:
                node["kernel"][...] = 0.0
                log.info(f"Reset weight in downsample {'/'.join(path)} to zero.")
                continue
            if "scale" in node and "bias" in node:
                if is_downsample:  # reference skips 'downsample.1' norms
                    continue
                w_key = "scale"
            elif "kernel" in node and "bias" in node \
                    and getattr(node["kernel"], "ndim", 0) == 4:
                # biased convs only — Dense layers (incl. the imprint block and
                # the head) stay untouched, like the reference's Conv2d filter
                w_key = "kernel"
            else:
                continue
            intermediates = apply_with_capture(params)[0]
            out = intermediates
            for key in path:
                out = out[key]
            out = np.asarray(out["__call__"][0])
            std, mu = float(out.std()), float(out.mean())
            log.info(f"Layer {'/'.join(path)}: mean {mu:.4f}, std {std:.4f}.")
            correction = std / gain + 1e-8
            node[w_key][...] = node[w_key] / correction
            node["bias"][...] = node["bias"] - mu / correction

        model.params = jax.tree_util.tree_map(jnp.asarray, params)


class MaliciousTransformerServer(HonestServer):
    """Decepticon server: rewires transformer parameters for analytic token
    recovery (reference: servers.py:384-523). Implemented against the flax
    text stack; see breaching_tpu/cases/malicious/transformer_rewiring.py."""

    THREAT = "Malicious (parameters)"

    def vet_model(self, model):
        from .transformer_rewiring import reconfigure_transformer

        model, secrets = reconfigure_transformer(
            model, self.loss, self.cfg_server, self.cfg_data, self.setup,
            external_dataloader=self.external_dataloader)
        self.secrets.update(secrets)
        self.model = model
        return model


class MaliciousClassParameterServer(HonestServer):
    """"Fishing" server: interactive multi-query protocol isolating single
    examples by class/feature parameter poisoning (reference: servers.py:526-895)."""

    THREAT = "Malicious (parameters)"

    def __init__(self, model, loss_fn, cfg_case, setup, external_dataloader=None):
        super().__init__(model, loss_fn, cfg_case, setup, external_dataloader)
        self.original_params = jax.tree_util.tree_map(jnp.asarray, model.params)

    def reset_model(self):
        self.model.params = jax.tree_util.tree_map(jnp.asarray, self.original_params)

    # -------------------------------------------------------------- head edits

    def _edit_head(self, fn):
        """Apply fn(kernel (in,out), bias) -> (kernel, bias) to a fresh copy of
        the original head parameters, then install them."""
        params = jax.tree_util.tree_map(jnp.asarray, self.original_params)
        node = params
        for key in self.model.head_path:
            node = node[key]
        if "kernel" not in node:
            node = node["dense"]
        node["kernel"], node["bias"] = fn(node["kernel"], node["bias"])
        self.model.params = params

    def reconfigure_for_class_attack(self, target_classes=None):
        """Constant-weight rows for the target classes, huge bias elsewhere
        (reference: servers.py:853-870)."""
        from .classattack_utils import wrap_indices

        cfg = self.cfg_server
        targets = wrap_indices(cfg.target_cls_idx if target_classes is None else target_classes)

        def fn(kernel, bias):
            masked_w = jnp.zeros_like(kernel)
            masked_w = masked_w.at[:, jnp.asarray(targets)].set(float(cfg.class_multiplier))
            masked_b = jnp.full_like(bias, float(cfg.bias_multiplier))
            masked_b = masked_b.at[jnp.asarray(targets)].set(bias[jnp.asarray(targets)])
            return masked_w, masked_b

        self._edit_head(fn)

    def reconfigure_for_feature_attack(self, feature_val, feature_loc,
                                       target_classes=None, allow_reset_param_weights=False):
        """One weight at (feature, class), bias cutoff at -feature_val
        (reference: servers.py:872-895)."""
        from .classattack_utils import wrap_indices

        cfg = self.cfg_server
        targets = wrap_indices(cfg.target_cls_idx if target_classes is None else target_classes)
        locs = wrap_indices(feature_loc)
        mult = 1.0 if (allow_reset_param_weights and cfg.get("reset_param_weights")) \
            else float(cfg.feat_multiplier)

        def fn(kernel, bias):
            masked_w = jnp.zeros_like(kernel)
            for cls in targets:
                masked_w = masked_w.at[jnp.asarray(locs), cls].set(mult)
            masked_b = jnp.full_like(bias, float(cfg.bias_multiplier))
            masked_b = masked_b.at[jnp.asarray(targets)].set(
                -float(feature_val) * float(cfg.feat_multiplier))
            return masked_w, masked_b

        self._edit_head(fn)

    # -------------------------------------------------------------- protocols

    def run_protocol(self, user, additional_users=None, run_honest_protocol=False):
        if run_honest_protocol:
            return super().run_protocol(user)
        if additional_users is not None:
            return self.run_protocol_feature_estimation(user, additional_users)
        return self.run_protocol_binary_attack(user)

    def run_protocol_binary_attack(self, user):
        """Class attack, escalating to a feature binary search under collisions
        (reference: run_protocol_binary_attack, servers.py:558-682)."""
        from .classattack_utils import reconstruct_feature

        cfg = self.cfg_server
        server_payload = self.distribute_payload()
        if cfg.query_once_for_labels:
            shared_data, true_user_data = user.compute_local_updates(server_payload)
            if shared_data["metadata"]["labels"] is not None:
                t_labels = np.asarray(shared_data["metadata"]["labels"]).reshape(-1)
            else:
                _, b_grad = self.model.head_grads(shared_data["gradients"])
                t_labels = self._recover_labels(
                    b_grad, int(shared_data["metadata"]["num_data_points"] or 1))
            log.info(f"Found labels {t_labels.tolist()} in first query.")
        else:
            t_labels = np.random.default_rng(0).choice(
                np.arange(self.cfg_data.classes), user.num_data_points)
            shared_data, true_user_data = user.compute_local_updates(server_payload)
            log.info(f"Randomly attacking labels {t_labels.tolist()}.")

        num_data = int(shared_data["metadata"]["num_data_points"] or len(t_labels))
        target_cls = int(np.unique(t_labels)[int(cfg.target_cls_idx)])
        target_indx = np.nonzero(t_labels == target_cls)[0]

        if cfg.get("opt_on_avg_grad"):
            self.reconfigure_for_class_attack(target_classes=list(np.unique(t_labels)))
            payload = self.distribute_payload()
            shared, _ = user.compute_local_updates(payload)
            final_shared, final_payload = [shared], [payload]
        elif len(target_indx) == 1:
            log.info(f"Attacking label {target_cls} with cls attack.")
            self.reconfigure_for_class_attack(target_classes=target_cls)
            payload = self.distribute_payload()
            shared, _ = user.compute_local_updates(payload)
            shared["metadata"] = dict(shared["metadata"],
                                      num_data_points=1,
                                      labels=jnp.asarray([target_cls]))
            final_shared, final_payload = [shared], [payload]
            self.secrets["ClassAttack"] = dict(
                num_data=1, target_indx=target_indx, true_num_data=num_data,
                all_labels=jnp.asarray(t_labels))
        else:
            log.info(f"Attacking label {target_cls} with binary attack "
                     f"({len(target_indx)} collisions).")
            self.reconfigure_for_class_attack(target_classes=target_cls)
            payload = self.distribute_payload()
            tmp_shared, _ = user.compute_local_updates(payload)
            avg_feature = np.asarray(
                reconstruct_feature(tmp_shared, target_cls, self.model)).reshape(-1)

            single_grads, feature_loc = None, -1
            masked_feature = avg_feature.copy()
            while single_grads is None:
                feature_loc = int(np.argmax(masked_feature))
                attack_state = dict(feature_loc=feature_loc,
                                    feature_val=float(masked_feature[feature_loc]),
                                    num_target_data=len(target_indx),
                                    num_data_points=num_data)
                if cfg.get("one_shot_binary_attack", True):
                    single_grads = self.one_shot_binary_attack(user, target_cls, attack_state)
                else:
                    # full recursive search: recovers EVERY colliding example
                    # (reference: binary_attack, servers.py:741-826)
                    single_grads = self.binary_attack(user, target_cls, attack_state)
                if single_grads is None:  # too many queries on this feature: try next
                    masked_feature[feature_loc] = -1000.0
                    log.info(f"Feature {feature_loc} exhausted after "
                             f"{user.counted_queries} queries; trying the next one.")

            self.reconfigure_for_feature_attack(
                attack_state["feature_val"], feature_loc, target_classes=target_cls,
                allow_reset_param_weights=True)
            payload = self.distribute_payload()

            # single_grads is ordered most-confident-first (largest recovered
            # feature first), the same order as the reference's
            # `list(reversed(recovered_single_gradients))` (servers.py:662).
            grad_i = single_grads[int(cfg.grad_idx)]
            shared = dict(gradients=grad_i, buffers=tmp_shared["buffers"],
                          metadata=dict(tmp_shared["metadata"],
                                        num_data_points=1,
                                        labels=jnp.asarray([target_cls])))
            final_shared, final_payload = [shared], [payload]
            self.secrets["ClassAttack"] = dict(
                num_data=1, target_indx=target_indx[int(cfg.grad_idx):int(cfg.grad_idx) + 1],
                true_num_data=num_data, all_labels=jnp.asarray(t_labels))

        log.info(f"User {user.user_idx} was queried {user.counted_queries} times.")
        self.reset_model()
        return final_shared, final_payload, true_user_data

    def one_shot_binary_attack(self, user, cls_to_obtain, attack_state):
        """Fixpoint iteration on the feature cutoff: querying at the current
        subset mean shrinks the contributing (below-cutoff) subset until it is
        stable — typically the smallest-feature datapoint alone
        (reference: servers.py:716-739)."""
        from .classattack_utils import check_with_tolerance, reconstruct_feature

        cfg = self.cfg_server
        feature_loc = attack_state["feature_loc"]
        feature_val = attack_state["feature_val"]
        num_data_points = attack_state["num_data_points"]
        all_vals = []
        for _ in range(32):
            all_vals.append(feature_val)
            self.reconfigure_for_feature_attack(feature_val, feature_loc,
                                                target_classes=cls_to_obtain)
            payload = self.distribute_payload()
            shared, _ = user.compute_local_updates(payload)
            avg_feature = np.asarray(
                reconstruct_feature(shared, cls_to_obtain, self.model)).reshape(-1)
            feature_val = float(avg_feature[feature_loc])
            if check_with_tolerance(feature_val, all_vals,
                                    threshold=float(cfg.feat_threshold)):
                break
        attack_state["feature_val"] = feature_val
        return [self._rescale_to_cumulative(shared["gradients"], num_data_points)]

    def _rescale_to_cumulative(self, grads, num_data_points):
        """Undo the batch mean: the user averaged over num_data_points examples,
        but only the examples above the feature cutoff contributed. Also undo the
        feat_multiplier amplification on non-bias leaves (reference:735-738)."""
        cfg = self.cfg_server
        head = self.model.head_path

        def rescale(path, leaf):
            keys = tuple(str(getattr(k, "key", k)) for k in path)
            if keys[: len(head)] == tuple(head) and keys[-1] == "bias":
                return leaf * num_data_points
            return leaf * num_data_points / float(cfg.feat_multiplier)

        return jax.tree_util.tree_map_with_path(rescale, grads)

    def binary_attack(self, user, cls_to_obtain, attack_state):
        """Recursive cutoff bisection: recover a single gradient for EVERY
        colliding example of the target class (reference: binary_attack +
        binary_attack_recursion, servers.py:741-826).

        Mechanics (verified empirically, matches Wen et al.): with the feature
        head installed, examples whose feature is well ABOVE the cutoff saturate
        the target logit (p_t -> 1, so dL/dz_t -> 0) and drop out of the
        gradient; examples below contribute with dL/dz_t ~= -1 independent of
        the exact cutoff. A query at cutoff c therefore yields the cumulative
        gradient of the examples below c (plus the softmax transition width
        ~15/feat_multiplier), and the mean feature of that lower subset.
        Bisecting between a cutoff and its response (and mirroring above)
        discovers cutoffs separating consecutive examples; differencing the
        cumulative gradients of consecutive ascending cutoffs isolates single
        examples — valid because contributor gradients are cutoff-independent
        in the saturated regime.

        Returns singles ordered most-confident-first (largest feature first,
        the order of the reference's `reversed(recovered_single_gradients)`),
        or None after num_target_data**2 queries without enough distinct
        subsets (the caller then retries on the next-best feature).
        """
        from .classattack_utils import check_with_tolerance, reconstruct_feature

        cfg = self.cfg_server
        thresh = float(cfg.feat_threshold)
        loc = attack_state["feature_loc"]
        n_target = attack_state["num_target_data"]
        num_data_points = attack_state["num_data_points"]
        max_queries = max(n_target ** 2, 4)

        accepted = []          # (cutoff, cumulative grads) with distinct responses
        visited_responses = []
        queries = 0
        frontier = [attack_state["feature_val"]]
        while frontier and len(accepted) < n_target and queries < max_queries:
            next_frontier = []
            for cutoff in frontier:
                if len(accepted) >= n_target or queries >= max_queries:
                    break
                self.reconfigure_for_feature_attack(cutoff, loc,
                                                    target_classes=cls_to_obtain)
                payload = self.distribute_payload()
                shared, _ = user.compute_local_updates(payload)
                queries += 1
                response = float(np.asarray(
                    reconstruct_feature(shared, cls_to_obtain, self.model)).reshape(-1)[loc])
                if not np.isfinite(response) or abs(response) < 1e-12:
                    continue  # empty subset: nothing below this cutoff
                if not check_with_tolerance(response, visited_responses, thresh):
                    visited_responses.append(response)
                    if not check_with_tolerance(cutoff, [c for c, _ in accepted], thresh):
                        accepted.append((cutoff, self._rescale_to_cumulative(
                            shared["gradients"], num_data_points)))
                    # bisect inside the lower subset and mirror above it
                    mirror = 2 * cutoff - response
                    for cand in (response, mirror, (cutoff + mirror) / 2,
                                 (cutoff + response) / 2):
                        if not check_with_tolerance(
                                cand, visited_responses + next_frontier, thresh):
                            next_frontier.append(cand)
            frontier = next_frontier
        log.info(f"Binary attack: {len(accepted)} distinct subsets from "
                 f"{queries} queries (target {n_target}).")
        if len(accepted) < n_target:
            return None

        # ascending cutoffs: accepted[0] holds the single smallest-feature
        # example, each later cumulative gradient adds one more example above.
        accepted.sort(key=lambda item: item[0])
        singles = [accepted[0][1]]
        for (_, cum), (_, prev) in zip(accepted[1:], accepted[:-1]):
            singles.append(jax.tree_util.tree_map(
                lambda a, b: a - b, cum, prev))
        # most-confident-first: largest-feature example leads
        return list(reversed(singles))

    def estimate_feat(self, additional_users, target_class=None):
        """Collect target-class features across users (reference: servers.py:828-851)."""
        from .classattack_utils import reconstruct_feature

        target_class = int(self.cfg_server.target_cls_idx if target_class is None
                           else target_class)
        est_features, sample_sizes = [], []
        for user in additional_users:
            payload = self.distribute_payload()
            shared, _ = user.compute_local_updates(payload)
            labels = np.asarray(shared["metadata"]["labels"]).reshape(-1) \
                if shared["metadata"]["labels"] is not None else np.asarray([])
            num_target = int((labels == target_class).sum())
            if num_target:
                est_features.append(np.asarray(
                    reconstruct_feature(shared, target_class, self.model)).reshape(-1))
                sample_sizes.append(num_target)
        if not est_features:
            raise ValueError(
                f"These additional users do not own images from class {target_class}.")
        return np.vstack(est_features).T, np.asarray(sample_sizes)

    def run_protocol_feature_estimation(self, target_user, additional_users):
        """Estimate the feature distribution on other users, then cut the target
        (reference: servers.py:684-714)."""
        from scipy import stats as scipy_stats

        from .classattack_utils import estimate_gt_stats, find_best_feat

        cfg = self.cfg_server
        log.info(f"Estimating feature distribution from {len(additional_users)} users.")
        self.reconfigure_for_class_attack()
        est_features, est_sizes = self.estimate_feat(additional_users)
        feature_loc = find_best_feat(est_features, est_sizes, method="kstest")
        est_mean, est_std = estimate_gt_stats(est_features, est_sizes, indx=feature_loc)

        expected_points = float(np.sum(est_sizes)) / len(additional_users)
        if expected_points == 1:
            feature_val = float(cfg.class_multiplier)
        else:
            quantile = 1 / expected_points * float(cfg.reweight_collisions)
            feature_val = float(scipy_stats.norm.ppf(quantile, est_mean, max(est_std, 1e-8)))
        log.info(f"Feature {feature_loc}: mu={est_mean:2.4f}, std={est_std:2.4f}, "
                 f"cutoff {feature_val:2.4f} for {expected_points} expected points.")

        self.reconfigure_for_feature_attack(feature_val, feature_loc)
        payload = self.distribute_payload()
        shared, true_user_data = target_user.compute_local_updates(payload)
        self.reconfigure_for_feature_attack(feature_val, feature_loc,
                                            allow_reset_param_weights=True)
        true_user_data["distribution"] = est_features[feature_loc]
        return [shared], [payload], true_user_data

    def _recover_labels(self, bias_grad, num_data):
        bias = np.asarray(bias_grad).copy()
        valid = np.nonzero(bias < 0)[0]
        selected = valid.tolist()
        m_impact = bias[valid].sum() / max(num_data, 1)
        bias[valid] -= m_impact
        while len(selected) < num_data:
            idx = int(np.argmin(bias))
            selected.append(idx)
            bias[idx] -= m_impact
        return np.sort(np.asarray(selected[:num_data]))
