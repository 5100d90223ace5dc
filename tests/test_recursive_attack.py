"""R-GAP oracle: near-exact recursive inversion of cnn6."""

import jax.numpy as jnp

import breaching_tpu as breaching


def test_rgap_cnn6_recovers_input():
    cfg = breaching.get_config([
        "case=1_single_image_small", "attack=rgap",
        "case.model=cnn6", "case.data.shape=[3, 16, 16]",
        "case.user.provide_labels=True", "case.user.num_data_points=1", "seed=77",
    ])
    setup = breaching.utils.system_startup(cfg=cfg)
    user, server, model, loss_fn = breaching.cases.construct_case(cfg.case, setup)
    attacker = breaching.attacks.prepare_attack(server.model, server.loss, cfg.attack, setup)
    shared, payloads, true_data = server.run_protocol(user)
    rec, stats = attacker.reconstruct(payloads, shared, server.secrets)

    from breaching_tpu.analysis.metrics import mse_psnr

    dm = jnp.asarray(cfg.case.data.mean).reshape(1, 1, 1, -1)
    ds = jnp.asarray(cfg.case.data.std).reshape(1, 1, 1, -1)
    _, psnr = mse_psnr(jnp.clip(rec["data"] * ds + dm, 0, 1),
                       jnp.clip(true_data["data"] * ds + dm, 0, 1), clip=True)
    assert float(psnr) > 20, f"R-GAP recursion too lossy: PSNR={float(psnr)}"
