"""Library-only usage of the attack stack without the cases simulation
(reference: minimal_example.py:33-74): hand-built payload/shared_data dicts.
"""

import jax
import jax.numpy as jnp

import breaching_tpu as breaching
from breaching_tpu.cases.models import construct_model
from breaching_tpu.config.loader import ConfigNode


def main():
    cfg_attack = breaching.get_attack_config("invertinggradients", overrides=[
        "attack.optim.max_iterations=400", "attack.optim.callback=100"])
    cfg_data = ConfigNode(
        name="CIFAR10", modality="vision", task="classification", classes=10,
        shape=[3, 32, 32], normalize=True,
        mean=[0.4914672374725342, 0.4822617471218109, 0.4467701315879822],
        std=[0.24703224003314972, 0.24348513782024384, 0.26158785820007324],
        path="~/data", size=50_000, examples_from_split="validation",
        partition="balanced", default_clients=10, batch_size=8, caching=False)

    setup = dict(dtype=jnp.float32, device=jax.devices()[0], key=jax.random.PRNGKey(208))
    model, loss_fn = construct_model("ConvNet", cfg_data, key=jax.random.PRNGKey(0))

    # Simulate a user update by hand: one image, one gradient.
    datapoint = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3)) * 0.2
    label = jnp.asarray([3])

    def task_loss(p):
        out, _ = model.apply(p, model.buffers, datapoint, train=False)
        return loss_fn(out, label)

    gradient = jax.grad(task_loss)(model.params)

    server_payload = [dict(parameters=model.params, buffers=model.buffers, metadata=cfg_data)]
    shared_data = [dict(
        gradients=gradient, buffers=None,
        metadata=dict(num_data_points=1, labels=label, local_hyperparams=None))]

    attacker = breaching.attacks.prepare_attack(model, loss_fn, cfg_attack, setup)
    reconstructed, stats = attacker.reconstruct(server_payload, shared_data, {}, dryrun=False)

    mse = float(jnp.mean(jnp.square(reconstructed["data"] - datapoint)))
    print(f"Reconstruction finished. MSE to ground truth: {mse:.6f}")
    return reconstructed


if __name__ == "__main__":
    main()
