"""Decepticon attack on user-provided text.

Counterpart of the reference notebook "Decepticons -  Analytic Attack - small
GPT2 on custom text.ipynb": instead of dataset sentences, a custom passage is
tokenized and injected through `user.compute_local_updates(custom_data=...)`
(reference notebook cell 21), then recovered from the malicious-transformer
exchange. Offline twist: the reference uses the HF GPT-2 BPE tokenizer (needs
a download); here a WordLevel tokenizer is trained on the passage itself
(cases/data/wordlevel_tokenizer.py), which is fully offline.

Usage:
  python examples/decepticon_custom_text.py [--model transformer3|hf-gpt2]
      [--seq 32] [--points 8] [--file my_text.txt]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_TEXT = """Transformers: Generation 1 is a toy line and animated series
about a race of robots that can change into vehicles, mechanical devices and
even animal forms. They waged war for eons on their home planet against their
heroic counterparts. Both factions needed supplies, and select numbers from
each side intended to get them. When their ship takes a beating and crashes
onto primitive Earth it knocks everyone unconscious. Millions of years later a
volcano eruption causes a probe to give them all new forms which come from
vehicles in the surrounding area. The war continues on this new world, and the
stakes are higher than ever before. Energy is the key to victory, and both
sides race to harvest every source they can find before their rivals do."""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="transformer3")
    ap.add_argument("--seq", type=int, default=32)
    ap.add_argument("--points", type=int, default=8)
    ap.add_argument("--file", default=None)
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()

    import numpy as np

    import breaching_tpu as breaching
    from breaching_tpu.cases.data.wordlevel_tokenizer import \
        generate_word_level_tokenizer

    text = open(args.file).read() if args.file else DEFAULT_TEXT
    lines = [ln for ln in text.splitlines() if ln.strip()]
    tokenizer = generate_word_level_tokenizer(lines=lines, vocab_size=50257)
    stream = []
    for ln in lines:
        stream.extend(tokenizer.encode(ln).ids)
    n_chunks = len(stream) // args.seq
    points = min(args.points, n_chunks)
    if points == 0:
        raise SystemExit(f"passage too short: {len(stream)} tokens < seq {args.seq}")
    ids = np.asarray(stream[: points * args.seq], dtype=np.int64)
    ids = ids.reshape(points, args.seq)

    overrides = [
        "case=10_causal_lang_training", "attack=decepticon",
        "case/server=malicious-transformer",
        f"case.model={args.model}", f"case.data.shape=[{args.seq}]",
        f"case.data.vocab_size={tokenizer.get_vocab_size()}",
        f"case.user.num_data_points={points}",
        "name=decepticon_custom_text", *args.overrides,
    ]
    cfg = breaching.get_config(overrides)
    setup = breaching.utils.system_startup(cfg=cfg)
    user, server, model, loss_fn = breaching.cases.construct_case(cfg.case, setup)
    attacker = breaching.attacks.prepare_attack(server.model, server.loss,
                                                cfg.attack, setup)
    breaching.utils.overview(server, user, attacker)

    # the FL exchange, with the custom passage as the user's private batch
    # (reference notebook cells 19-21)
    payload = server.distribute_payload()
    shared, true_user_data = user.compute_local_updates(
        payload, custom_data=dict(input_ids=ids, labels=ids.copy()))

    rec, stats = attacker.reconstruct([payload], [shared], server.secrets,
                                      dryrun=cfg.dryrun)
    metrics = breaching.analysis.report(rec, true_user_data, [payload],
                                        server.model, order_batch=True,
                                        compute_full_iip=False,
                                        cfg_case=cfg.case, setup=setup)
    breaching.utils.dump_metrics(cfg, metrics)

    vocab = {i: t for t, i in tokenizer.get_vocab().items()}
    for row in np.asarray(rec["data"]):
        print("REC:", " ".join(vocab.get(int(t), "<unk>") for t in row))


if __name__ == "__main__":
    main()
