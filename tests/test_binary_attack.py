"""Recursive binary fishing attack: every colliding example is individually
recovered (reference: servers.py:741-826 binary_attack/_recursion).

Uses a sharp softmax transition (feat_multiplier=30000, bias_multiplier=0) so
the 16x16 test model's small feature spread is separable; the physics are the
same as the reference's ImageNet setting (width ~15/feat_multiplier)."""

import jax
import jax.numpy as jnp
import numpy as np

import breaching_tpu as breaching

OVERRIDES = [
    "case=1_single_image_small", "attack=clsattack",
    "case/server=malicious-fishing", "case.model=ConvNetSmall16",
    "case.data.shape=[3, 16, 16]", "case.data.partition=unique-class",
    "case.user.user_idx=3", "case.user.num_data_points=3",
    "case.user.provide_labels=True",
    "case.server.one_shot_binary_attack=False",
    "case.server.feat_multiplier=30000", "case.server.bias_multiplier=0",
    "seed=13",
]


def _setup():
    cfg = breaching.get_config(OVERRIDES)
    setup = breaching.utils.system_startup(cfg=cfg)
    user, server, model, loss_fn = breaching.cases.construct_case(cfg.case, setup)
    return cfg, user, server, loss_fn


def _flat(tree):
    return np.concatenate([np.asarray(l).ravel()
                           for l in jax.tree_util.tree_leaves(tree)])


def test_binary_attack_recovers_all_colliders():
    from breaching_tpu.cases.malicious.classattack_utils import reconstruct_feature

    cfg, user, server, loss_fn = _setup()
    payload = server.distribute_payload()
    shared, true_data = user.compute_local_updates(payload)
    labels = np.asarray(true_data["labels"]).reshape(-1)
    cls = int(labels[0])
    assert (labels == cls).all(), "needs a 3-way class collision"

    # feature location from the class-attack query (as the protocol does)
    server.reconfigure_for_class_attack(target_classes=cls)
    s2, _ = user.compute_local_updates(server.distribute_payload())
    avg_feat = np.asarray(reconstruct_feature(s2, cls, server.model)).reshape(-1)
    loc = int(np.argmax(avg_feat))

    attack_state = dict(feature_loc=loc, feature_val=float(avg_feat[loc]),
                        num_target_data=3, num_data_points=3)
    singles = server.binary_attack(user, cls, attack_state)
    assert singles is not None and len(singles) == 3

    # ground truth: per-example gradients at an everyone-contributes state
    # (cutoff far above all features — contributor gradients are
    # cutoff-independent in the saturated regime)
    server.reconfigure_for_feature_attack(1e3, loc, target_classes=cls)
    p_all = server.distribute_payload()
    params = jax.tree_util.tree_map(jnp.asarray, p_all["parameters"])
    buffers = p_all["buffers"] or server.model.buffers

    def one_grad(x):
        def tl(p):
            out, _ = server.model.apply(p, buffers, x[None], train=False)
            return loss_fn(out, jnp.asarray([cls]))
        return jax.grad(tl)(params)

    truth = [server._rescale_to_cumulative(one_grad(true_data["data"][i]), 1)
             for i in range(3)]

    # each recovered single matches exactly one distinct true example
    t_flat = [_flat(t) for t in truth]
    matched = []
    for s in singles:
        s_flat = _flat(s)
        errs = [np.mean((s_flat - t) ** 2) / (np.mean(t ** 2) + 1e-12)
                for t in t_flat]
        best = int(np.argmin(errs))
        assert errs[best] < 1e-2, errs
        matched.append(best)
    assert sorted(matched) == [0, 1, 2], matched


def test_binary_attack_through_protocol():
    """cfg.grad_idx selects distinct recovered examples through run_protocol."""
    rec_grads = {}
    for idx in (0, 2):
        cfg, user, server, loss_fn = _setup()
        cfg.case.server.grad_idx = idx
        server.cfg_server.grad_idx = idx
        shared, payloads, true_data = server.run_protocol(user)
        assert shared[0]["metadata"]["num_data_points"] == 1
        rec_grads[idx] = _flat(shared[0]["gradients"])
        assert "ClassAttack" in server.secrets
    diff = np.mean((rec_grads[0] - rec_grads[2]) ** 2) / (
        np.mean(rec_grads[0] ** 2) + 1e-12)
    assert diff > 1e-3, "different grad_idx must select different examples"


def test_feature_estimation_protocol():
    """Cross-user feature estimation (reference: servers.py:684-714 /
    "Feature Fishing Cross Device" notebook): additional users' updates
    estimate the target class's feature distribution, then the target user is
    cut at a quantile. The returned exchange must isolate a reduced number of
    contributors and carry the estimated distribution for evaluation."""
    overrides = [
        "case=1_single_image_small", "attack=clsattack",
        "case/server=malicious-fishing", "case.model=ConvNetSmall16",
        "case.data.shape=[3, 16, 16]", "case.data.partition=feat_est",
        "case.data.target_label=0", "case.data.num_data_points=2",
        "case.user.num_data_points=2", "case.user.provide_labels=True",
        "case.server.target_cls_idx=0", "seed=3",
    ]
    cfg = breaching.get_config(overrides)
    setup = breaching.utils.system_startup(cfg=cfg)
    user, server, model, loss_fn = breaching.cases.construct_case(cfg.case, setup)
    additional = []
    for idx in (1, 2, 3):
        cfg.case.user.user_idx = idx
        additional.append(breaching.cases.construct_user(model, server.loss,
                                                         cfg.case, setup))
    shared, payloads, true_data = server.run_protocol(
        user, additional_users=additional)
    assert len(shared) == 1 and len(payloads) == 1
    assert "distribution" in true_data
    grads = _flat(shared[0]["gradients"])
    assert np.isfinite(grads).all() and np.abs(grads).sum() > 0
    # the feature cut must suppress most examples: the head bias gradient row
    # of the target class dominates
    classes = int(cfg.case.data.classes)
    bias_leaves = [np.asarray(l) for l in jax.tree_util.tree_leaves(
        shared[0]["gradients"]) if np.asarray(l).shape == (classes,)]
    assert bias_leaves, "no head-bias gradient leaf found"
    assert int(np.argmax(np.abs(bias_leaves[-1]))) == 0
