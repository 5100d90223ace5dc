"""Unit tests for the Decepticon exact-reference stack: _supplement_exact,
_recover_collisions, _exact_position_round (decepticon_attack.py).

Self-consistency design: breached states are composed with the attack's OWN
exact reference builder — LN_first(embLN(wte[t] + pos[p] [+ tte_0])), the same
function the forward pass applies — so a correct implementation must recover
tokens/positions at correlation ~1.0. This pins the machinery the hf-bert
preset enables (exact_supplement / collision_recovery / exact_refinement)
independently of the full pipeline's clustering/backfill noise.

Reference: beyond-reference additions; the additive baseline they improve on
is /root/reference/breaching/attacks/analytic_attack.py:591-622.
"""

import numpy as np
import pytest

import breaching_tpu as breaching

V = 4  # content-slice start (mirrors param_modification.v_length semantics)
SEQ = 12


@pytest.fixture(scope="module")
def exact_env():
    cfg = breaching.get_config([
        "case=10_causal_lang_training", "attack=decepticon",
        "case/server=malicious-transformer", "case/data=random-tokens",
        "case.data.task=masked-lm", "case.model=bert-tiny",
        f"case.data.shape=[{SEQ}]", "case.data.vocab_size=512",
        "case.data.default_clients=40", "case.server.has_external_data=False",
        "case.user.num_data_points=1", "seed=13",
    ])
    setup = breaching.utils.system_startup(cfg=cfg)
    user, server, _, loss_fn = breaching.cases.construct_case(cfg.case, setup)
    shared, payloads, _ = server.run_protocol(user)
    attacker = breaching.attacks.prepare_attack(server.model, server.loss,
                                                cfg.attack, setup)
    rec_models, tokens, stats = attacker.prepare_attack(payloads, shared)
    model = rec_models[0]
    builder = attacker._exact_reference_builder(model, SEQ)
    assert builder is not None, "bert-tiny registry must expose exact tables"
    return attacker, model, builder


def _sliced_refs(builder, positions, tokens):
    return np.asarray(builder(np.asarray(positions), np.asarray(tokens)))[:, V:-1]


def test_supplement_exact_recovers_planted_tokens(exact_env):
    """Zero-confidence slots holding exact composed states must all be
    replaced with the true tokens (correlation ~1.0 beats any weight)."""
    attacker, model, builder = exact_env
    rng = np.random.default_rng(0)
    true_tokens = rng.choice(np.arange(1, 500), size=SEQ, replace=False)
    ordered = _sliced_refs(builder, np.arange(SEQ), true_tokens)
    recovered = np.zeros(SEQ, np.int64)
    costs = np.full(SEQ, -np.inf)
    out = attacker._supplement_exact(recovered, costs, ordered, model,
                                     (1, SEQ), V, weight=0.8)
    assert out is not None
    assert (out == true_tokens).all(), (out, true_tokens)
    # costs were raised to the (near-1.0) match correlations in place
    assert (costs > 0.9).all(), costs


def test_supplement_exact_keeps_confident_slots(exact_env):
    """A slot whose existing confidence beats weight * match-correlation is
    left alone — the supplement only overrides genuinely weak claims."""
    attacker, model, builder = exact_env
    true_tokens = np.arange(1, SEQ + 1)
    ordered = _sliced_refs(builder, np.arange(SEQ), true_tokens)
    planted = np.full(SEQ, 7, np.int64)  # wrong everywhere
    costs = np.full(SEQ, np.inf)  # but fully confident
    out = attacker._supplement_exact(planted.copy(), costs, ordered, model,
                                     (1, SEQ), V, weight=0.5)
    assert out is not None
    assert (out == planted).all()


def test_recover_collisions_decomposes_shared_row(exact_env):
    """Two positions sharing one bias-weighted collided row: the primary keeps
    its token, the secondary slot claims the minority component's token from
    the residual after subtracting the fitted exact reference."""
    attacker, model, builder = exact_env
    slot_a, slot_b = 3, 7
    t_a, t_b = 101, 202
    state_a = _sliced_refs(builder, [slot_a], [t_a])[0]
    state_b = _sliced_refs(builder, [slot_b], [t_b])[0]
    collided_row = 0.6 * state_a + 0.4 * state_b

    ordered = np.zeros((SEQ, collided_row.shape[0]))
    ordered[slot_a] = collided_row
    ordered[slot_b] = collided_row  # backfill copied the same bin row
    recovered = np.zeros(SEQ, np.int64)
    recovered[slot_a] = t_a
    costs = np.full(SEQ, -np.inf)
    costs[slot_a], costs[slot_b] = 0.9, 0.1  # primary = best-explained slot
    leaked = np.asarray([t_a, t_b])

    out_tokens, out_costs = attacker._recover_collisions(
        model, ordered, recovered.copy(), costs.copy(), leaked, (1, SEQ), V)
    assert out_tokens[slot_a] == t_a
    assert out_tokens[slot_b] == t_b, out_tokens
    assert out_costs[slot_b] > 0.2  # claimed above collision_threshold


def test_exact_position_round_moves_rows_home(exact_env):
    """Rows planted at wrong positions (tokens known) must be re-assigned to
    the position whose exact composed reference they match; slots left
    rowless get -inf confidence so the supplement re-examines them."""
    attacker, model, builder = exact_env
    rng = np.random.default_rng(1)
    filled_true = np.asarray([0, 2, 4, 6, 8, 10])
    toks = rng.choice(np.arange(1, 500), size=len(filled_true), replace=False)
    rows = _sliced_refs(builder, filled_true, toks)

    wrong_slots = np.asarray([1, 3, 5, 7, 9, 11])  # everything misplaced
    ordered = np.zeros((SEQ, rows.shape[1]))
    tokens = np.zeros(SEQ, np.int64)
    costs = np.full(SEQ, -np.inf)
    for w, r, t in zip(wrong_slots, rows, toks):
        ordered[w] = r
        tokens[w] = t
        costs[w] = 0.8

    moved, new_ordered, new_tokens, new_costs = attacker._exact_position_round(
        model, ordered, tokens, costs, (1, SEQ), V)
    assert moved
    for p, r, t in zip(filled_true, rows, toks):
        np.testing.assert_allclose(new_ordered[p], r, rtol=1e-6, atol=1e-8)
        assert new_tokens[p] == t
        assert new_costs[p] > 0.9  # assignment correlation travels with the row
    # the vacated slots must NOT retain stale confidence (round-4 advisor fix)
    for w in wrong_slots:
        assert new_costs[w] == -np.inf, (w, new_costs[w])
        assert np.linalg.norm(new_ordered[w]) == 0.0
