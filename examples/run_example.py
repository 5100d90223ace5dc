"""Run a named example setting (see examples/README.md for the table).

Usage: python examples/run_example.py deep_leakage [extra=overrides ...]
Demo-scale overrides keep runtimes short; pass --full for paper-scale settings.
"""

import sys

sys.path.insert(0, ".")

EXAMPLES = {
    "inverting_gradients_resnet18": ["case=2_single_imagenet", "attack=invertinggradients"],
    # reference notebook "...ResNet18 on ImageNet - Federated Averaging"
    # (PSNR 20.78): despite the filename, the committed notebook overrides
    # case/data=CIFAR10 + model resnet18 + TV 1e-3 + partition random — an
    # UNTRAINED CIFAR-stem ResNet18 on 32x32 (reference examples/"Inverting
    # Gradients...Federated Averaging.ipynb", cfg cell; the reference loads no
    # checkpoint for custom CIFAR models). This preset matches that setting.
    "inverting_gradients_fedavg": ["case=4_fedavg_small_scale", "attack=invertinggradients",
                                   "case/data=CIFAR10", "case.data.partition=random",
                                   "case.model=ResNet18", "case.server.pretrained=False",
                                   "case.user.num_data_points=4",
                                   "case.user.num_local_updates=4",
                                   "case.user.num_data_per_local_update_step=2",
                                   "case.user.provide_labels=True",
                                   "case.user.user_idx=1",
                                   "attack.regularization.total_variation.scale=1e-3"],
    # the setting the notebook's TITLE names (ImageNetAnimals at 224, in-repo
    # trained checkpoint): kept as a strictly-harder tracked row
    "inverting_gradients_fedavg_imagenet": ["case=4_fedavg_small_scale", "attack=invertinggradients",
                                            "case.user.num_data_points=4",
                                            "case.user.num_local_updates=4",
                                            "case.user.num_data_per_local_update_step=2",
                                            "case.user.provide_labels=True",
                                            "case.user.user_idx=1"],
    # demo-scale fedAVG variant (ConvNet on CIFAR-10 — the fast sandbox the
    # old case-4 yaml used to bake in; now a visible preset)
    "inverting_gradients_fedavg_cifar": ["case=4_fedavg_small_scale", "attack=invertinggradients",
                                         "case/data=CIFAR10", "case.model=ConvNet",
                                         "case.user.num_data_points=4",
                                         "case.user.num_local_updates=4",
                                         "case.user.num_data_per_local_update_step=2",
                                         "case.user.provide_labels=True"],
    # grad_accum=10: one double-backward over the full batch of 100 on the
    # 46M-param WRN exceeds v5e HBM; checkpointed micro-batches of 10 fit.
    # callback=100: at ~3 it/s a 1000-iteration chunk is a single >5-minute
    # device execution, which trips the remote worker deadline.
    "inverting_large_batch_cifar": ["case=6_large_batch_cifar", "attack=invertinggradients",
                                    "attack.impl.grad_accum=10",
                                    "attack.optim.callback=100"],
    "deep_leakage": ["case=1_single_image_small", "attack=deepleakage",
                     "case.user.provide_labels=False"],
    # notebook overrides: unique-class partition, TV 1e-4 (the yaml default
    # 0.2352 is the paper's MNIST-scaled value, wrong for 32x32 RGB)
    "beyond_inferring": ["case=1_single_image_small", "attack=beyondinfering",
                         "case.data.partition=unique-class", "case.user.user_idx=1",
                         "attack.regularization.total_variation.scale=1e-4"],
    "wei_framework": ["case=1_single_image_small", "attack=wei"],
    # reference notebook: single image, unique-class partition, user sends
    # BN statistics with the gradient (no public buffers)
    "see_through_gradients": ["case=5_small_batch_imagenet", "attack=seethroughgradients",
                              "case.data.partition=unique-class",
                              "case.user.num_data_points=1",
                              "case.server.provide_public_buffers=False",
                              "case.user.provide_buffers=True"],
    "modern_hyperparams": ["case=2_single_imagenet", "attack=modern"],
    "legacy_hyperparams": ["case=2_single_imagenet", "attack=legacy"],
    "multiscale": ["case=2_single_imagenet", "attack=multiscale_ghiasi"],
    "rgap": ["case=1_single_image_small", "attack=rgap", "case.model=cnn6"],
    "april": ["case=2_single_imagenet", "attack=april_analytic", "case.model=vit_base_april"],
    "robbing_the_fed": ["case=2_single_imagenet", "attack=imprint",
                        "case/server=malicious-model-rtf"],
    "curious_abandon_honesty": ["case=1_single_image_small", "attack=imprint",
                                "case/server=malicious-model-cah"],
    "fishing": ["case=5_small_batch_imagenet", "attack=clsattack",
                "case/server=malicious-fishing", "case.user.provide_labels=True",
                "case.user.num_data_points=8"],
    # reference notebook "Meta Optimization-based Attack - Feature Fishing
    # Cross-Silo-Unique Data": worst case, each user owns one class (PSNR 12.27)
    "fishing_optimization_unique": [
        "case=2_single_imagenet", "attack=clsattack",
        "case/server=malicious-fishing", "case.data.partition=unique-class",
        "case.user.num_data_points=50",
        "case.user.user_idx=1", "case.user.provide_labels=True",
        "case.server.target_cls_idx=0"],
    # reference notebook "Meta Optimization-based Attack - Feature Fishing
    # Cross-Silo": average case, aggregate over a random partition (PSNR 12.34)
    "fishing_optimization_cross_silo": [
        "case=2_single_imagenet", "attack=clsattack",
        "case/server=malicious-fishing", "case/user=multiuser_aggregate",
        "case.user.user_range=[0,1]", "case.data.partition=random",
        "case.user.num_data_points=256",
        "case.data.default_clients=32", "case.user.provide_labels=True",
        "case.server.target_cls_idx=0"],
    # reference notebook "Meta Analytic Attack - Feature Fishing Cross-Silo":
    # the fishing server isolates the target-class image in the 50-image
    # unique-class batch, then APRIL recovers it analytically (ref PSNR 12.52)
    "fishing_analytic_cross_silo": [
        "case=2_single_imagenet", "attack=april_analytic",
        "case/server=malicious-fishing", "case.model=vit_small_april",
        "case.data.partition=unique-class",
        "case.user.num_data_points=50",
        "case.user.user_idx=1", "case.user.provide_labels=True",
        "case.server.target_cls_idx=0",
        "case.server.bias_multiplier=0",
        "case.server.reset_param_weights=False"],
    # cross-device feature fishing (reference notebook "Fishing for User Data -
    # Meta Analytic Attack - Feature Fishing Cross Device": the server
    # estimates the target class's feature distribution on 55 other users,
    # cuts the target user at a quantile, then APRIL recovers the isolated
    # image analytically; ref metrics PSNR 13.76)
    "fishing_feature_cross_device": [
        "case=2_single_imagenet", "attack=april_analytic",
        "case/server=malicious-fishing", "case.model=vit_small_april",
        "case.data.partition=feat_est", "case.data.examples_from_split=training",
        "case.data.default_clients=56", "case.server.target_cls_idx=2",
        "case.data.target_label=2", "case.user.num_data_points=16",
        "case.data.num_data_points=16", "case.user.provide_labels=True",
        "case.server.feature_estimation_users=55"],
    # notebook setting: 8 sentences x 32 tokens
    "decepticons_transformer": ["case=10_causal_lang_training", "attack=decepticon",
                                "case/server=malicious-transformer",
                                "case.user.num_data_points=8", "case.user.user_idx=1",
                                "case.data.batch_size=8",
                                "case.data.default_clients=1000"],
    # notebook setting: 1 sentence x 512 tokens
    # plain preset: a controlled A/B on the cached 1x512 lab exchange measured
    # the exact-reference stack NEUTRAL for the flax bert-style model
    # (positional acc 0.9160 plain vs 0.9141 all-flags; every leave-one-out
    # within 0.002) — the flags stay off here and on for hf-bert, where they
    # measurably help on fresh exchanges (0.8965 -> 0.9043)
    "decepticons_bert": ["case=9_bert_training", "attack=decepticon",
                         "case/server=malicious-transformer", "case.model=bert-base-uncased",
                         "case.user.num_data_points=1", "case.user.user_idx=1",
                         "case.data.shape=[512]"],
    # THE notebook setting ("small GPT2 on wikitext"): gpt2S = full GPT-2 with
    # ReLU, 8 sentences x 512 tokens, same server/attack params as hf-gpt2
    "decepticons_gpt2": ["case=10_causal_lang_training", "attack=decepticon",
                         "case/server=malicious-transformer", "case.model=gpt2S",
                         "case.user.num_data_points=8", "case.user.user_idx=1",
                         "case.data.shape=[512]", "case.data.batch_size=8",
                         "case.data.default_clients=1000",
                         "case.server.param_modification.v_length=32",
                         "case.server.param_modification.eps=1e-8",
                         "case.server.param_modification.measurement_scale=1e6",
                         "case.server.param_modification.softmax_skew=1e8",
                         "attack.token_strategy=embedding-norm",
                         "attack.embedding_token_weight=0.25"],
    # real HuggingFace Flax architectures (reference notebook hyperparameters;
    # full-size models — the positional-correlation margin scales with hidden
    # dim, so the -S test configs are NOT representative of attack quality)
    "decepticons_hf_gpt2": [
        # reference notebook setting: 8 sentences x 512 tokens, v_length 32,
        # embedding-norm ("no decoder bias in GPT"). The notebook uses
        # embedding_token_weight 0; 0.25 measures +0.9pt positional acc here
        # (0.8933 vs 0.8840, lab exchange), so the better default stays.
        "case=10_causal_lang_training", "attack=decepticon",
        "case/server=malicious-transformer", "case.model=hf-gpt2",
        "case.user.num_data_points=8", "case.data.shape=[512]",
        "case.user.user_idx=1", "case.data.batch_size=8",
        "case.data.default_clients=1000",
        "case.server.param_modification.v_length=32",
        "case.server.param_modification.eps=1e-8",
        "case.server.param_modification.measurement_scale=1e6",
        "case.server.param_modification.softmax_skew=1e8",
        "attack.token_strategy=embedding-norm", "attack.embedding_token_weight=0.25"],
    "decepticons_hf_bert": [
        # reference notebook setting: 1 sentence x 512 tokens, v_length 32
        "case=9_bert_training", "attack=decepticon",
        "case/server=malicious-transformer", "case.model=hf-bert",
        "case.user.num_data_points=1", "case.data.shape=[512]",
        "case.user.user_idx=1",
        "case.server.param_modification.reset_embedding=True",
        "case.server.param_modification.v_length=32",
        "case.server.param_modification.eps=1e-8",
        "case.server.param_modification.measurement_scale=1e8",
        "case.server.param_modification.softmax_skew=1e8",
        # embedding-norm with calibrated power-law counts beats mixed here
        # (positional acc 0.8965 vs 0.8828 on the cached 1x512 lab exchange);
        # BERT's untied embeddings take the sparsity branch, and the MLM-head
        # bias that mixed relies on only sees the 15% supervised positions
        "attack.token_strategy=embedding-norm",
        # exact-reference matching stack (see decepticon_attack.py): composed
        # LN(embLN(wte+pos+tte)) references sharpen the full-vocab supplement,
        # enable collided-bin decomposition, and drive position/token
        # alternation — measured on the cached 1x512 lab exchange
        "attack.exact_supplement=True", "attack.collision_recovery=True",
        "attack.exact_refinement=2",
        "attack.embedding_token_weight=0.8"],
    # text imprints (reference wikitext notebooks: 128 sentences x 32 tokens)
    "robbing_the_fed_text": [
        "case=10_causal_lang_training", "attack=imprint",
        "case/server=malicious-model-rtf",
        "case.user.num_data_points=128", "case.user.user_idx=1",
        "case.data.default_clients=1000",  # synthetic corpus: 200k seqs total
        "case.server.model_modification.num_bins=512",
        "case.server.model_modification.linfunc=randn"],
    "curious_abandon_honesty_text": [
        "case=10_causal_lang_training", "attack=imprint",
        "case/server=malicious-model-cah",
        "case.user.num_data_points=128", "case.user.user_idx=1",
        "case.data.default_clients=1000",
        "case.server.model_modification.num_bins=512",
        "case.server.model_modification.sigma=0.5",
        "case.server.model_modification.mu=0",
        "case.server.model_modification.scale_factor=0.999"],
    "tag": ["case=10_causal_lang_training", "attack=tag"],
    "permutation": ["case=10_causal_lang_training", "attack=permutation"],
    "sanity_check": ["case=0_sanity_check", "attack=analytic"],
    # callback=25: each L-BFGS iteration is ~21 closure evals, so a 100-iter
    # transformer chunk exceeds the remote worker deadline
    "dlg_text": ["case=10_causal_lang_training", "attack=deepleakage",
                 "case.user.provide_labels=False", "attack.optim.callback=25"],
}

# demo-scale overrides (drop with --full)
DEMO = ["attack.optim.max_iterations=500", "attack.optim.callback=100"]


def main():
    if len(sys.argv) < 2 or sys.argv[1] not in EXAMPLES:
        print(f"Usage: python examples/run_example.py <name> [overrides...]\n"
              f"Available: {', '.join(sorted(EXAMPLES))}")
        raise SystemExit(1)
    name = sys.argv[1]
    extra = [a for a in sys.argv[2:] if a != "--full"]
    overrides = ([f"name={name}"] + EXAMPLES[name]
                 + ([] if "--full" in sys.argv else DEMO) + extra)

    import simulate_breach

    sys.argv = ["simulate_breach.py", *overrides]
    simulate_breach.main_launcher()


if __name__ == "__main__":
    main()
