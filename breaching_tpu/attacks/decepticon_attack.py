"""Decepticon analytic readout: recover full token sequences from a maliciously
rewired transformer's gradients.

TPU-native counterpart of reference breaching/attacks/analytic_attack.py
DecepticonAttacker:156-824. Pipeline (positions-first default):

1. token bag recovery from embedding/decoder gradients (decoder-bias etc.),
2. breach extraction: concatenate all FF imprint gradients, de-cumsum the
   cumulative bins, divide weight rows by bias rows -> per-(sentence, position)
   hidden states,
3. sentence disambiguation by the [0:v] "sentence key" components (k-means),
4. position assignment per sentence: |corrcoef| assignment of breached states
   against *layer-normed* positional embeddings over the [v:-1] content slice
   (reference:208-236); unmatched positions are backfilled from collided rows,
5. decorrelation separation of the positional component (reference:568-589),
6. token assignment of leaked tokens to slots (assignment, each token used once)
   plus full-vocabulary supplement for low-confidence slots (reference:591-622).

Correlation matrices are dense matmuls; the Hungarian solves are tiny and stay on
host, like the reference (README.md:86 notes the attack is CPU-friendly).
"""

from __future__ import annotations

import logging

import jax.numpy as jnp
import numpy as np

from .analytic_attack import AnalyticAttacker

log = logging.getLogger(__name__)


def _fetch(tree, path):
    node = tree
    for key in path:
        node = node[key]
    return node


def _cross_corrcoef(a, b):
    """Centered correlation between rows of a [N, D] and b [M, D] as one matmul."""
    a = a - a.mean(axis=1, keepdims=True)
    b = b - b.mean(axis=1, keepdims=True)
    a = a / np.maximum(np.linalg.norm(a, axis=1, keepdims=True), 1e-10)
    b = b / np.maximum(np.linalg.norm(b, axis=1, keepdims=True), 1e-10)
    return a @ b.T


class DecepticonAttacker(AnalyticAttacker):
    def reconstruct(self, server_payload, shared_data, server_secrets=None, dryrun=False):
        rec_models, tokens, stats = self.prepare_attack(server_payload, shared_data)
        shared_data = self._shared_data_cache
        if not server_secrets or "ImprintBlock" not in server_secrets:
            raise ValueError("Decepticon readout requires the malicious-transformer secrets.")
        secrets = server_secrets["ImprintBlock"]
        model = rec_models[0]
        metadata = server_payload[0]["metadata"]
        len_data = int(shared_data[0]["metadata"]["num_data_points"] or 1)
        seq_len = int(metadata.shape[0])
        v = int(secrets["v_length"])

        norm_scale, norm_bias = self._first_norm_params(model)
        embedding_table = np.asarray(_fetch(model.params, model.aux["registry"]["embedding"]))
        leaked = np.asarray(tokens).reshape(-1) if tokens is not None else None

        breached, strength = self._extract_breaches(shared_data[0]["gradients"], secrets)
        order = np.argsort(-strength)
        keep = order[: len_data * seq_len]
        keep = keep[strength[keep] > 0]
        breached = breached[keep]
        log.info(f"Extracted {len(breached)} breached states with signal.")
        if len(breached) == 0:
            fallback = leaked if leaked is not None else np.zeros(len_data * seq_len, np.int64)
            return dict(data=jnp.asarray(fallback).reshape(len_data, seq_len),
                        labels=tokens), stats

        # layer-normed positional references, tiled per sentence (reference:183-188)
        pos_table = self._positional_table(model, seq_len)
        positions_normed = _layer_norm(pos_table, norm_scale, norm_bias)
        positional = np.tile(positions_normed, (len_data, 1))

        # sentence separation on the raw sentence-key components (reference:190-200)
        if len_data > 1:
            sentence_labels = self._cluster_sentences(breached[:, :v], len_data)
        else:
            sentence_labels = np.zeros(len(breached), np.int64)

        if self.cfg.get("sentence_based_backfill") and len_data > 1:
            breached, sentence_labels = self._sentence_backfill(
                breached, sentence_labels, (len_data, seq_len), v)

        # all further matching on the [v:-1] content slice (reference:208-211)
        breached_c = breached[:, v:-1].copy()
        positional_c = positional[:, v:-1]
        leaked_emb_c = None
        if leaked is not None:
            leaked_emb = _layer_norm(embedding_table[leaked], norm_scale, norm_bias)
            leaked_emb_c = leaked_emb[:, v:-1]

        recovery_order = self.cfg.get("recovery_order", "positions-first")
        if recovery_order == "tokens-first" and leaked is not None and len(leaked) > 0:
            # ---- tokens-first recovery (reference:258-314) ----
            token_order, breach_sel, costs = self._match_embeddings(breached_c, leaked_emb_c)
            breach_tokens = np.zeros(len(breached_c), np.int64)
            breach_costs = np.full(len(breached_c), -np.inf)
            breach_tokens[token_order] = leaked[breach_sel]
            breach_costs[token_order] = costs
            token_embs = _layer_norm(embedding_table[breach_tokens], norm_scale, norm_bias)[:, v:-1]
            just_positions = self._separate(breached_c, token_embs)
            recovered_tokens = np.zeros(len_data * seq_len, np.int64)
            slot_costs = np.full(len_data * seq_len, -np.inf)
            for sentence in range(len_data):
                mask = sentence_labels == sentence
                if not mask.any():
                    continue
                pos_idx, row_idx, pos_costs = self._match_embeddings(
                    positional_c[:seq_len], just_positions[mask])
                recovered_tokens[sentence * seq_len + pos_idx] = breach_tokens[mask][row_idx]
                slot_costs[sentence * seq_len + pos_idx] = breach_costs[mask][row_idx] * pos_costs
            final_tokens = recovered_tokens.reshape(len_data, seq_len)
            confidence = np.clip(slot_costs, 0, 1).reshape(len_data, seq_len)
            return dict(data=jnp.asarray(final_tokens), labels=tokens,
                        confidence=jnp.asarray(confidence)), stats

        # ---- positions-first recovery (reference:213-256, default) ----
        ordered = np.zeros((len_data * seq_len, breached_c.shape[1]), breached_c.dtype)
        for sentence in range(len_data):
            rows = breached_c[sentence_labels == sentence]
            if len(rows) == 0:
                continue
            pos_idx, sel, costs = self._match_embeddings(positional_c[:seq_len], rows)
            ordered[sentence * seq_len + pos_idx] = rows[sel]

        if len(breached_c) < len(positional_c):
            ordered = self._backfill_embeddings(
                ordered, breached_c, positional_c, sentence_labels, (len_data, seq_len))

        breached_without_positions = self._separate(ordered, positional_c)

        if leaked is not None and len(leaked) > 0:
            token_order, slot_sel, costs = self._match_embeddings(
                breached_without_positions, leaked_emb_c)
            recovered_tokens = np.zeros(len_data * seq_len, np.int64)
            slot_costs = np.full(len_data * seq_len, -np.inf)
            recovered_tokens[token_order] = leaked[slot_sel]
            slot_costs[token_order] = costs
        else:
            recovered_tokens = np.zeros(len_data * seq_len, np.int64)
            slot_costs = np.full(len_data * seq_len, -np.inf)

        weight = float(self.cfg.get("embedding_token_weight", 0.25) or 0.0)
        if weight > 0 or leaked is None:
            recovered_tokens = self._supplement_from_full_vocabulary(
                recovered_tokens, slot_costs, breached_without_positions,
                embedding_table, norm_scale, norm_bias, v, weight)

        final_tokens = recovered_tokens.reshape(len_data, seq_len)
        confidence = np.clip(slot_costs, 0, 1).reshape(len_data, seq_len)
        return dict(data=jnp.asarray(final_tokens), labels=tokens,
                    confidence=jnp.asarray(confidence)), stats

    # ------------------------------------------------------------------ pieces

    def _first_norm_params(self, model):
        """(scale, bias) of the first block's post-attention LayerNorm."""
        try:
            norm = model.params["layer0"]["norm1"]
            return np.asarray(norm["scale"]), np.asarray(norm["bias"])
        except (KeyError, TypeError):
            dim = model.aux.get("ninp", 96)
            return np.ones(dim, np.float32), np.zeros(dim, np.float32)

    def _extract_breaches(self, gradients, secrets):
        """FF imprint gradients -> breached hidden states
        (reference: _extract_breaches:324-397). flax kernels are (D, H)."""
        weight_rows, bias_rows = [], []
        for w_path in secrets["weight_paths"]:
            layer = _fetch(gradients, w_path)
            weight_rows.append(np.asarray(layer["kernel"]).T)   # (H, D)
            bias_rows.append(np.asarray(layer["bias"]))
        weights = np.concatenate(weight_rows, axis=0)           # (bins, D)
        biases = np.concatenate(bias_rows, axis=0)              # (bins,)

        if secrets["structure"] == "cumulative":
            weights = np.concatenate([weights[:1], weights[1:] - weights[:-1]], axis=0)
            biases = np.concatenate([biases[:1], biases[1:] - biases[:-1]])
        elif secrets["structure"] == "cumulative-per-layer":
            # bins are cumulative within each layer's block (bin_setup separate/repeat)
            H = int(secrets["hidden_dim"])
            for start in range(0, len(biases), H):
                block_w = weights[start:start + H]
                block_b = biases[start:start + H]
                weights[start + 1:start + H] = block_w[1:] - block_w[:-1]
                biases[start + 1:start + H] = block_b[1:] - block_b[:-1]

        valid = np.abs(biases) > 1e-10
        safe_bias = np.where(valid, biases, np.inf)
        states = weights / safe_bias[:, None]
        return states, np.abs(np.where(valid, biases, 0.0))

    def _positional_table(self, model, seq_len):
        from ..cases.malicious.transformer_rewiring import _positional_table

        params = {k: np.asarray(val) for k, val in model.params.items()}
        return np.asarray(_positional_table(model.module, params, seq_len))

    def _cluster_sentences(self, keys, num_sentences):
        """Sentence disambiguation on the key components (reference clustering
        zoo: analytic_attack.py:624-757 — constrained k-means / k-medoids /
        dynamic threshold / fcluster). 'threshold'/'fcluster' use hierarchical
        clustering on correlation distance; 'k-medoids' and the default map to
        k-means (medoid refinement changes assignments only at the margin)."""
        algorithm = self.cfg.get("sentence_algorithm", "k-means") or "k-means"
        if algorithm in ("threshold", "fcluster", "dynamic-threshold"):
            from scipy.cluster.hierarchy import fcluster, linkage

            normed = (keys - keys.mean(axis=1, keepdims=True))
            normed = normed / np.maximum(np.linalg.norm(normed, axis=1, keepdims=True), 1e-10)
            link = linkage(normed, method="average", metric="cosine")
            labels = fcluster(link, t=num_sentences, criterion="maxclust") - 1
            return labels.astype(np.int64)
        from sklearn.cluster import KMeans

        km = KMeans(n_clusters=num_sentences, n_init=10, random_state=0)
        return km.fit_predict(keys).astype(np.int64)

    def _sentence_backfill(self, breached, sentence_labels, shape, v_len,
                           match_t=0.75, nontrivial_t=1e-2):
        """Replicate collided breaches into under-filled sentences when their
        sentence-key residual still correlates with that sentence's seed
        (reference: _sentence_backfill:521-566)."""
        len_data, seq_len = shape
        keys = breached[:, :v_len]
        mean = keys.mean(axis=-1, keepdims=True)
        std = keys.std(axis=-1, keepdims=True) + 1e-10
        normed = (keys - mean) / std
        seeds = np.stack([
            np.median(normed[sentence_labels == s], axis=0)
            if (sentence_labels == s).any() else np.zeros(v_len)
            for s in range(len_data)])
        unmixed = self._separate(normed, seeds[sentence_labels])
        nontrivial = np.linalg.norm(unmixed, axis=1) > nontrivial_t
        comp_ids = np.nonzero(nontrivial)[0]
        components = unmixed[nontrivial]

        for _ in range(seq_len):
            counts = np.bincount(sentence_labels, minlength=len_data)
            free = seq_len - counts
            if free.max() <= 0 or len(components) == 0:
                break
            rep_seeds = np.repeat(seeds, np.maximum(free, 0), axis=0)
            rep_labels = np.repeat(np.arange(len_data), np.maximum(free, 0))
            if len(rep_seeds) == 0:
                break
            seed_idx, comp_idx, costs = self._match_embeddings(components, rep_seeds)
            matches = costs > match_t
            if not matches.any():
                break
            matched_rows = comp_ids[seed_idx[matches]]
            breached = np.concatenate([breached, breached[matched_rows]], axis=0)
            sentence_labels = np.concatenate(
                [sentence_labels, rep_labels[comp_idx[matches]]])
            components[seed_idx[matches]] = self._separate(
                components[seed_idx[matches]], rep_seeds[comp_idx[matches]])
            keep = np.linalg.norm(components, axis=1) > nontrivial_t
            components, comp_ids = components[keep], comp_ids[keep]
        return breached, sentence_labels

    def _match_embeddings(self, references, queries):
        """Assignment of query rows to reference rows by max |correlation|
        (reference: _match_embeddings:759-786). Returns
        (reference_indices, query_indices, matched correlations)."""
        from scipy.optimize import linear_sum_assignment

        corr = _cross_corrcoef(np.asarray(queries), np.asarray(references))  # (nq, nr)
        score = np.abs(corr) if "abs" in self.cfg.get("matcher", "abs-corrcoef") else corr
        q_ind, r_ind = linear_sum_assignment(-score)
        return r_ind, q_ind, score[q_ind, r_ind]

    def _separate(self, mixed, base):
        """Remove a base component from mixed rows (reference:568-589)."""
        scheme = self.cfg.get("separation", "decorrelation") or "none"
        if scheme == "subtraction":
            return mixed - base
        if scheme == "none":
            return mixed.copy()
        # decorrelation (default): remove the correlated part in normalized space
        m_mean = mixed.mean(axis=-1, keepdims=True)
        m_std = mixed.std(axis=-1, keepdims=True) + 1e-10
        b_mean = base.mean(axis=-1, keepdims=True)
        b_std = base.std(axis=-1, keepdims=True) + 1e-10
        m_normed = (mixed - m_mean) / m_std
        b_normed = (base - b_mean) / b_std
        corr = (m_normed * b_normed).sum(-1, keepdims=True) / (
            np.linalg.norm(m_normed, axis=-1, keepdims=True)
            * np.linalg.norm(b_normed, axis=-1, keepdims=True) + 1e-10)
        unmixed = m_normed - corr * b_normed
        return unmixed * m_std + m_mean

    def _backfill_embeddings(self, ordered, fillable, positional, sentence_labels, shape):
        """Fill empty slots with (collided) breach rows (reference:399-457, 'local')."""
        len_data, seq_len = shape
        mode = self.cfg.get("backfilling", "local") or "local"
        if mode == "global":
            free = np.nonzero(np.linalg.norm(ordered, axis=-1) == 0)[0]
            while len(free) > 0 and len(fillable) > 0:
                pos_idx, sel, _ = self._match_embeddings(positional[free], fillable)
                ordered[free[pos_idx]] = fillable[sel]
                new_free = np.nonzero(np.linalg.norm(ordered, axis=-1) == 0)[0]
                if len(new_free) == len(free):
                    break
                free = new_free
            return ordered
        for sentence in range(len_data):
            rows = fillable[sentence_labels == sentence]
            if len(rows) == 0:
                continue
            block = ordered[sentence * seq_len:(sentence + 1) * seq_len]
            free = np.nonzero(np.linalg.norm(block, axis=-1) == 0)[0]
            while len(free) > 0:
                pos_idx, sel, _ = self._match_embeddings(positional[:seq_len][free], rows)
                block[free[pos_idx]] = rows[sel]
                new_free = np.nonzero(np.linalg.norm(block, axis=-1) == 0)[0]
                if len(new_free) == len(free):
                    break
                free = new_free
            ordered[sentence * seq_len:(sentence + 1) * seq_len] = block
        return ordered

    def _supplement_from_full_vocabulary(self, recovered_tokens, costs, breached,
                                         embedding_table, norm_scale, norm_bias, v, weight):
        """Replace low-confidence slots by greedy full-vocabulary correlation
        (reference:591-622). The (slots x vocab) correlation is one matmul."""
        all_embeddings = _layer_norm(embedding_table, norm_scale, norm_bias)[1:, v:-1]
        corr = _cross_corrcoef(breached, all_embeddings)
        score = np.abs(corr) if "abs" in self.cfg.get("matcher", "abs-corrcoef") else corr
        best = score.argmax(axis=1)
        best_val = score[np.arange(len(best)), best]
        replace = best_val * max(weight, 1e-9) > costs
        num_replaced = int(replace.sum())
        if num_replaced:
            log.info(f"Replaced {num_replaced} tokens from the full vocabulary "
                     f"(avg new corr {best_val[replace].mean():.2f}).")
        recovered_tokens = np.where(replace, best + 1, recovered_tokens)
        return recovered_tokens


def _layer_norm(x, scale, bias, eps=1e-5):
    mean = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mean) / np.sqrt(var + eps) * scale + bias
