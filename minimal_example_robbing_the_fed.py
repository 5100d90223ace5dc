"""Library-only imprint attack without the cases simulation
(reference: minimal_example_robbing_the_fed.py:53-98): place an imprint block by
hand, compute one gradient, and read the inputs back out analytically.
"""

import jax
import jax.numpy as jnp

import breaching_tpu as breaching
from breaching_tpu.cases.malicious.imprint import ImprintBlock
from breaching_tpu.cases.malicious.servers import ImprintedModel
from breaching_tpu.cases.models import construct_model
from breaching_tpu.config.loader import ConfigNode

NUM_BINS = 64
DATA_SHAPE = (32, 32, 3)  # NHWC


def main():
    cfg_attack = breaching.get_attack_config("imprint")
    cfg_data = ConfigNode(
        name="CIFAR10", modality="vision", task="classification", classes=10,
        shape=[3, 32, 32], normalize=True,
        mean=[0.4914672374725342, 0.4822617471218109, 0.4467701315879822],
        std=[0.24703224003314972, 0.24348513782024384, 0.26158785820007324],
        path="~/data", size=50_000, examples_from_split="validation",
        partition="balanced", default_clients=10, batch_size=8, caching=False)
    setup = dict(dtype=jnp.float32, device=jax.devices()[0], key=jax.random.PRNGKey(208))

    # Hand-built malicious model: imprint block in front of a ConvNet.
    victim, loss_fn = construct_model("ConvNetSmall16", cfg_data, key=jax.random.PRNGKey(0))
    block = ImprintBlock(data_shape=DATA_SHAPE, num_bins=NUM_BINS)
    wrapped = ImprintedModel(block=block, victim=victim.module)
    variables = wrapped.init(jax.random.PRNGKey(1), victim.input_example, train=False)
    import dataclasses

    model = dataclasses.replace(victim, module=wrapped,
                                head_path=("victim",) + tuple(victim.head_path))
    model.params = dict(variables["params"])
    model.params["victim"] = victim.params

    secrets = dict(ImprintBlock=dict(
        weight_path=("block", "linear0_kernel"), bias_path=("block", "linear0_bias"),
        shape=DATA_SHAPE, structure=block.structure))

    # One "user" gradient on a private datapoint:
    datapoint = jax.nn.sigmoid(jax.random.normal(jax.random.PRNGKey(2), (1, *DATA_SHAPE)))
    dm = jnp.asarray(cfg_data.mean).reshape(1, 1, 1, -1)
    ds = jnp.asarray(cfg_data.std).reshape(1, 1, 1, -1)
    datapoint = (datapoint - dm) / ds
    label = jnp.asarray([3])

    def task_loss(p):
        out, _ = model.apply(p, {}, datapoint, train=False)
        return loss_fn(out, label)

    gradient = jax.grad(task_loss)(model.params)

    server_payload = [dict(parameters=model.params, buffers=None, metadata=cfg_data)]
    shared_data = [dict(gradients=gradient, buffers=None,
                        metadata=dict(num_data_points=1, labels=label,
                                      local_hyperparams=None))]

    attacker = breaching.attacks.prepare_attack(model, loss_fn, cfg_attack, setup)
    reconstructed, stats = attacker.reconstruct(server_payload, shared_data, secrets)

    mse = float(jnp.mean(jnp.square(reconstructed["data"] - datapoint)))
    print(f"Imprint readout finished. MSE to ground truth: {mse:.2e}")
    return reconstructed


if __name__ == "__main__":
    main()
