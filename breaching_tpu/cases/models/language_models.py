"""Language models: transformer encoder LM, LSTM, linear baseline.

TPU-native counterpart of reference breaching/cases/models/language_models.py
(TransformerModel:148-200, RNNModel:27-85, LinearModel:11-24,
PositionalEmbedding:89-130) and the text-model factory in
model_preparation.py:42-131. Models accept either int token ids [B, T] or float
embeddings [B, T, D] (the 'run-embedding' attack strategy feeds embeddings
directly, replacing the reference's Embedding->Identity surgery).

Each constructed model carries a *registry* of pytree paths (aux['registry'])
naming embedding/positional/attention/FF parameters — the functional counterpart
of the reference's transformer_dictionary.py attribute walking, consumed by the
Decepticon server rewiring and readout.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def fixed_positional_encoding(max_len: int, d_model: int) -> np.ndarray:
    """Sin/cos positional table (reference: PositionalEmbedding:89-130)."""
    pe = np.zeros((max_len, d_model), np.float32)
    position = np.arange(max_len)[:, None].astype(np.float32)
    div_term = np.exp(np.arange(0, d_model, 2).astype(np.float32) * (-math.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term[: pe[:, 1::2].shape[1]])
    return pe


class EncoderLayer(nn.Module):
    """Post-LN transformer encoder layer (torch TransformerEncoderLayer semantics:
    attention -> add&norm -> FF(relu) -> add&norm)."""

    dim: int
    num_heads: int
    hidden: int
    activation: str = "relu"
    norm_first: bool = False

    @nn.compact
    def __call__(self, x):
        B, T, D = x.shape
        head_dim = D // self.num_heads

        def attention(h):
            qkv = nn.Dense(3 * D, name="attn_qkv")(h)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            reshape = lambda t: t.reshape(B, T, self.num_heads, head_dim).transpose(0, 2, 1, 3)
            q, k, v = reshape(q), reshape(k), reshape(v)
            scores = q @ k.transpose(0, 1, 3, 2) / jnp.sqrt(head_dim)
            out = (jax.nn.softmax(scores, axis=-1) @ v).transpose(0, 2, 1, 3).reshape(B, T, D)
            return nn.Dense(D, name="attn_out")(out)

        act = nn.relu if self.activation == "relu" else nn.gelu

        def feedforward(h):
            self.sow("intermediates", "ff_input", h)  # Decepticon calibration probe
            h = nn.Dense(self.hidden, name="linear1")(h)
            h = act(h)
            return nn.Dense(self.dim, name="linear2")(h)

        if self.norm_first:
            x = x + attention(nn.LayerNorm(name="norm1")(x))
            x = x + feedforward(nn.LayerNorm(name="norm2")(x))
        else:
            x = nn.LayerNorm(name="norm1")(x + attention(x))
            x = nn.LayerNorm(name="norm2")(x + feedforward(x))
        return x


class TransformerModel(nn.Module):
    """Encoder-style LM with fixed or learnable positional embeddings and an
    optionally tied decoder (reference: TransformerModel:148-200).

    `imprint_block` is the functional counterpart of the reference's deeper
    malicious-block placement for text (MaliciousModelServer `position` option):
    it runs on the embedded sequence right after the token lookup, so the
    Robbing-the-Fed readout recovers embedding sequences and re-identifies tokens.
    """

    ntokens: int
    ninp: int
    nhead: int
    nhid: int
    nlayers: int
    positional_embedding: str = "fixed"
    tie_weights: bool = False
    norm_first: bool = False
    max_len: int = 1024
    imprint_block: nn.Module | None = None
    # sequence classification (GLUE-style, e.g. data=cola): first-position
    # pooling + a Dense head replaces the LM decoder (the reference reaches
    # this through AutoModelForSequenceClassification, model_preparation.py:108)
    num_classes: int | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        embedding = self.param(
            "embedding",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -0.1, 0.1)
            * math.sqrt(self.ninp),
            (self.ntokens, self.ninp))
        if jnp.issubdtype(x.dtype, jnp.integer):
            h = embedding[x]
        else:
            h = x  # 'run-embedding' attack path: embeddings fed directly
        if self.imprint_block is not None:
            h = self.imprint_block(h, train=train)
        T = h.shape[1]

        if self.positional_embedding == "fixed":
            table = fixed_positional_encoding(self.max_len, self.ninp)
            h = h + jnp.asarray(table)[None, :T, :]
        else:
            # torch-init-parity: the reference's LearnablePositionalEmbedding is
            # a plain nn.Embedding, i.e. N(0,1) per element
            # (reference language_models.py:133-145). A small init here makes
            # same-token states collide in Decepticon's measurement bins.
            pos = self.param("pos_embedding", nn.initializers.normal(1.0),
                             (self.max_len, self.ninp))
            h = h + pos[None, :T, :]

        for i in range(self.nlayers):
            h = EncoderLayer(self.ninp, self.nhead, self.nhid,
                             norm_first=self.norm_first, name=f"layer{i}")(h)

        self.sow("intermediates", "features", h)
        if self.num_classes is not None:
            return nn.Dense(self.num_classes, name="classifier")(h[:, 0, :])
        if self.tie_weights:
            bias = self.param("decoder_bias", nn.initializers.zeros, (self.ntokens,))
            return h @ embedding.T + bias
        return nn.Dense(
            self.ntokens,
            kernel_init=lambda key, shape, dtype=jnp.float32: jax.random.uniform(
                key, shape, dtype, -0.1, 0.1),
            name="decoder")(h)


class LSTMModel(nn.Module):
    """Word-level LSTM LM (reference: RNNModel:27-85)."""

    ntokens: int
    ninp: int = 96
    nhid: int = 96
    tie_weights: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        embedding = self.param(
            "embedding",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -0.1, 0.1),
            (self.ntokens, self.ninp))
        h = embedding[x] if jnp.issubdtype(x.dtype, jnp.integer) else x
        B, T, _ = h.shape

        ScanLSTM = nn.scan(nn.OptimizedLSTMCell, variable_broadcast="params",
                           split_rngs={"params": False}, in_axes=1, out_axes=1)
        cell = ScanLSTM(self.nhid, name="lstm")
        carry = cell.initialize_carry(jax.random.PRNGKey(0), (B, self.ninp))
        _, outputs = cell(carry, h)
        self.sow("intermediates", "features", outputs)
        if self.tie_weights and self.nhid == self.ninp:
            bias = self.param("decoder_bias", nn.initializers.zeros, (self.ntokens,))
            return outputs @ embedding.T + bias
        return nn.Dense(self.ntokens, name="decoder")(outputs)


class LinearLM(nn.Module):
    """Embedding -> linear decoder sanity model (reference: LinearModel:11-24)."""

    ntokens: int
    ninp: int = 200

    @nn.compact
    def __call__(self, x, train: bool = False):
        embedding = self.param("embedding", nn.initializers.normal(0.1),
                               (self.ntokens, self.ninp))
        h = embedding[x] if jnp.issubdtype(x.dtype, jnp.integer) else x
        self.sow("intermediates", "features", h)
        return nn.Dense(self.ntokens, name="decoder")(h)


def _registry(nlayers, positional, tied):
    """Pytree-path registry (replaces reference transformer_dictionary.py:5-134)."""
    reg = dict(
        embedding=("embedding",),
        pos_embedding=("pos_embedding",) if positional == "learnable" else None,
        decoder=("decoder",) if not tied else None,
        decoder_bias=("decoder_bias",) if tied else ("decoder", "bias"),
        attention_qkv=[(f"layer{i}", "attn_qkv") for i in range(nlayers)],
        attention_out=[(f"layer{i}", "attn_out") for i in range(nlayers)],
        ff_first=[(f"layer{i}", "linear1") for i in range(nlayers)],
        ff_second=[(f"layer{i}", "linear2") for i in range(nlayers)],
        norms=[(f"layer{i}", n) for i in range(nlayers) for n in ("norm1", "norm2")],
        nlayers=nlayers,
    )
    return reg


def construct_text_model(cfg_model, cfg_data, key=None, pretrained: bool = False):
    """Text model factory (reference: model_preparation.py:42-131).

    bert-/gpt2-style names build architecture-equivalent flax transformers
    (pre-LN causal for gpt2, post-LN bidirectional for bert); pretrained HF
    checkpoints are not available offline in this environment.
    """
    from .losses import LOSSES, CausalLoss
    from .model_preparation import JaxModel

    name = str(cfg_model)
    vocab = int(cfg_data.vocab_size)
    seq = int(cfg_data.shape[0])

    if name == "transformer3f":
        module = TransformerModel(vocab, 96, 8, 1536, 3, positional_embedding="fixed")
    elif name == "transformer3":
        module = TransformerModel(vocab, 96, 8, 1536, 3, positional_embedding="learnable")
    elif name == "transformer3t":
        module = TransformerModel(vocab, 96, 8, 1536, 3, positional_embedding="learnable",
                                  tie_weights=True)
    elif name == "transformer1":
        module = TransformerModel(vocab, 200, 1, 200, 1)
    elif name == "transformerS":
        module = TransformerModel(vocab, 512, 1, 512, 1)
    elif name == "LSTM":
        module = LSTMModel(vocab)
    elif name == "linear":
        module = LinearLM(vocab)
    elif name == "gpt2-tiny":
        # test-scale gpt2-style block: pre-LN + tied decoder (the full "gpt2"
        # below is the paper-scale 768x12 variant)
        module = TransformerModel(vocab, 96, 8, 1536, 3, positional_embedding="learnable",
                                  norm_first=True, tie_weights=True)
    elif name == "bert-tiny":
        # test-scale bert-style block: post-LN, untied, used with masked-lm
        module = TransformerModel(vocab, 96, 8, 1536, 3, positional_embedding="learnable")
    elif name in ("gpt2S", "bert-sanity-check"):
        # reference semantics (model_preparation.py:112-117): full-size HF
        # architectures with ReLU activations and dropout disabled — NOT small
        # models ("S" notwithstanding). The Decepticon GPT-2 notebook's
        # headline numbers use these.
        return _construct_hf_flax_model(name, cfg_data, key, pretrained=pretrained)
    elif name.startswith("hf-"):
        # exact HuggingFace Flax architecture (config-only, no weight download).
        # Supported families: gpt2, roberta, distilbert, bert (+ '-tiny' test
        # scales). Continuous-embedding attacks (TAG) work through a flax
        # method interceptor that emulates inputs_embeds — reference wraps the
        # torch versions in HuggingFaceContainer, model_preparation.py:97-149.
        return _construct_hf_flax_model(name[3:], cfg_data, key,
                                        pretrained=pretrained)
    elif "gpt2" in name.lower():
        module = TransformerModel(vocab, 768, 12, 3072, 12, positional_embedding="learnable",
                                  norm_first=True, tie_weights=True)
    elif "bert" in name.lower():
        module = TransformerModel(vocab, 768, 12, 3072, 12, positional_embedding="learnable")
    else:
        raise ValueError(f"Unknown text model {cfg_model}.")

    head_path = ("decoder",)
    if getattr(cfg_data, "task", None) == "classification":
        # GLUE-style sequence classification (reference: AutoModelFor-
        # SequenceClassification, model_preparation.py:101-108)
        if not isinstance(module, TransformerModel):
            raise ValueError(f"task=classification needs a transformer model, "
                             f"got {name}.")
        module = module.clone(num_classes=int(cfg_data.classes),
                              tie_weights=False)
        head_path = ("classifier",)
    if key is None:
        key = jax.random.PRNGKey(0)
    example = jnp.zeros((1, seq), jnp.int32)
    model = JaxModel(name=name, module=module, params={}, buffers={},
                     modality="text", head_path=head_path, input_example=example)
    model.params, model.buffers = model.init_state(key, example)
    tied = isinstance(module, TransformerModel) and module.tie_weights
    if isinstance(module, TransformerModel):
        model.aux = dict(registry=_registry(module.nlayers, module.positional_embedding, tied),
                         ninp=module.ninp, nhid=module.nhid)
        if tied:
            model.head_path = ("embedding",)  # decoder == embedding weights
    else:
        model.aux = dict(registry=dict(embedding=("embedding",),
                                       decoder_bias=("decoder", "bias")))

    if pretrained:
        from .model_preparation import _maybe_load_pretrained

        _maybe_load_pretrained(model, cfg_data)
    loss_cls = LOSSES.get(getattr(cfg_data, "task", "causal-lm"), CausalLoss)
    return model, loss_cls()


def _gpt2_registry(nlayers):
    """Pytree-path registry for the HF Flax GPT-2 architecture (the counterpart
    of reference transformer_dictionary.py's gpt2 entries). GPT-2's Conv1D
    kernels are stored (out, in) — kernel_layout='out_in' (the reference's
    ff_transposed case)."""
    h = lambda i, *rest: ("transformer", "h", str(i), *rest)
    return dict(
        embedding=("transformer", "wte", "embedding"),
        pos_embedding=("transformer", "wpe", "embedding"),
        decoder_bias=None,  # GPT-2's LM head is tied and bias-free
        attention_qkv=[h(i, "attn", "c_attn") for i in range(nlayers)],
        attention_out=[h(i, "attn", "c_proj") for i in range(nlayers)],
        ff_first=[h(i, "mlp", "c_fc") for i in range(nlayers)],
        ff_second=[h(i, "mlp", "c_proj") for i in range(nlayers)],
        norms=[h(i, n) for i in range(nlayers) for n in ("ln_1", "ln_2")],
        first_ff_norm=("transformer", "h", "0", "ln_2"),  # pre-LN: FF input
        kernel_layout="out_in",
        nlayers=nlayers,
    )


def _bert_registry(nlayers):
    """Registry for HF Flax BERT: separate query/key/value paths, post-LN."""
    l = lambda i, *rest: ("bert", "encoder", "layer", str(i), *rest)
    return dict(
        embedding=("bert", "embeddings", "word_embeddings", "embedding"),
        pos_embedding=("bert", "embeddings", "position_embeddings", "embedding"),
        type_embedding=("bert", "embeddings", "token_type_embeddings", "embedding"),
        decoder_bias=("cls", "predictions", "bias"),
        attention_qkv=[dict(query=l(i, "attention", "self", "query"),
                            key=l(i, "attention", "self", "key"),
                            value=l(i, "attention", "self", "value"))
                       for i in range(nlayers)],
        attention_out=[l(i, "attention", "output", "dense") for i in range(nlayers)],
        ff_first=[l(i, "intermediate", "dense") for i in range(nlayers)],
        ff_second=[l(i, "output", "dense") for i in range(nlayers)],
        first_ff_norm=("bert", "encoder", "layer", "0", "attention", "output",
                       "LayerNorm"),
        embedding_norm=("bert", "embeddings", "LayerNorm"),  # norm_layer0
        kernel_layout="in_out",
        nlayers=nlayers,
    )


def _roberta_registry(nlayers):
    """Registry for HF Flax RoBERTa: BERT block layout under the `roberta`
    trunk with a tied `lm_head` decoder (reference wraps these through
    HuggingFaceContainer, model_preparation.py:97-149)."""
    l = lambda i, *rest: ("roberta", "encoder", "layer", str(i), *rest)
    return dict(
        embedding=("roberta", "embeddings", "word_embeddings", "embedding"),
        pos_embedding=("roberta", "embeddings", "position_embeddings", "embedding"),
        type_embedding=("roberta", "embeddings", "token_type_embeddings", "embedding"),
        decoder_bias=("lm_head", "bias"),
        attention_qkv=[dict(query=l(i, "attention", "self", "query"),
                            key=l(i, "attention", "self", "key"),
                            value=l(i, "attention", "self", "value"))
                       for i in range(nlayers)],
        attention_out=[l(i, "attention", "output", "dense") for i in range(nlayers)],
        ff_first=[l(i, "intermediate", "dense") for i in range(nlayers)],
        ff_second=[l(i, "output", "dense") for i in range(nlayers)],
        first_ff_norm=("roberta", "encoder", "layer", "0", "attention", "output",
                       "LayerNorm"),
        embedding_norm=("roberta", "embeddings", "LayerNorm"),
        kernel_layout="in_out",
        pos_offset=2,  # positions start at pad_token_id + 1 (HF roberta)
        nlayers=nlayers,
    )


def _distilbert_registry(nlayers):
    """Registry for HF Flax DistilBERT: single-trunk post-LN blocks
    (q_lin/k_lin/v_lin/out_lin + ffn.lin1/lin2) and a tied vocab_projector."""
    l = lambda i, *rest: ("distilbert", "transformer", "layer", str(i), *rest)
    return dict(
        embedding=("distilbert", "embeddings", "word_embeddings", "embedding"),
        pos_embedding=("distilbert", "embeddings", "position_embeddings", "embedding"),
        decoder_bias=("vocab_projector", "bias"),
        attention_qkv=[dict(query=l(i, "attention", "q_lin"),
                            key=l(i, "attention", "k_lin"),
                            value=l(i, "attention", "v_lin"))
                       for i in range(nlayers)],
        attention_out=[l(i, "attention", "out_lin") for i in range(nlayers)],
        ff_first=[l(i, "ffn", "lin1") for i in range(nlayers)],
        ff_second=[l(i, "ffn", "lin2") for i in range(nlayers)],
        first_ff_norm=("distilbert", "transformer", "layer", "0", "sa_layer_norm"),
        embedding_norm=("distilbert", "embeddings", "LayerNorm"),
        kernel_layout="in_out",
        nlayers=nlayers,
    )


def _construct_hf_flax_model(hf_name, cfg_data, key, pretrained: bool = False):
    """Wrap a HuggingFace Flax LM into the JaxModel contract.

    Unlike the round-1 ids-only pass-through, this exposes the full attack
    surface: an architecture registry (rewiring/Decepticon), intermediate
    capture translated to the layerN/ff_input + features convention, and
    re-initializable state. `-S` suffixed names build test-scale configs.
    Counterpart of reference model_preparation.py:97-149 (HuggingFaceContainer)
    + transformer_dictionary.py.
    """
    import dataclasses

    from .losses import LOSSES, CausalLoss
    from .model_preparation import JaxModel

    vocab = int(cfg_data.vocab_size)
    small = hf_name.endswith("-tiny")
    if "gpt2" in hf_name:
        from transformers import FlaxGPT2LMHeadModel, GPT2Config

        if small:
            config = GPT2Config(vocab_size=vocab, n_positions=64, n_embd=96,
                                n_layer=3, n_head=8, resid_pdrop=0.0,
                                embd_pdrop=0.0, attn_pdrop=0.0)
        elif hf_name == "gpt2S":
            # reference gpt2S: full gpt2 with ReLU, no dropout
            config = GPT2Config(vocab_size=vocab, activation_function="relu",
                                resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0)
        else:
            config = GPT2Config(vocab_size=vocab)
        hf_model = FlaxGPT2LMHeadModel(config, seed=0)
        nlayers, ninp = config.n_layer, config.n_embd
        nhid = config.n_inner or 4 * config.n_embd
        registry = _gpt2_registry(nlayers)
        # pre-LN: the FF input of block i is its ln_2 output
        ff_tap = lambda i: ("transformer", "h", str(i), "ln_2")
        final_norm, call_style = ("transformer", "ln_f"), "gpt2"
        head_path = registry["embedding"][:-1]
    elif "roberta" in hf_name:  # before the bert branch: "ro*bert*a"
        from transformers import FlaxRobertaForMaskedLM, RobertaConfig

        seq = int(cfg_data.shape[0])
        if small:
            config = RobertaConfig(vocab_size=vocab, hidden_size=96,
                                   num_hidden_layers=3, num_attention_heads=8,
                                   intermediate_size=384,
                                   max_position_embeddings=seq + 4,
                                   pad_token_id=1, hidden_dropout_prob=0.0,
                                   attention_probs_dropout_prob=0.0)
        else:
            # roberta-base geometry: 514 positions absorb the +2 pad offset
            config = RobertaConfig(vocab_size=vocab,
                                   max_position_embeddings=max(514, seq + 4),
                                   pad_token_id=1)
        hf_model = FlaxRobertaForMaskedLM(config, seed=0)
        nlayers, ninp = config.num_hidden_layers, config.hidden_size
        nhid = config.intermediate_size
        registry = _roberta_registry(nlayers)
        ff_tap = lambda i: ("roberta", "encoder", "layer", str(i),
                            "attention", "output", "LayerNorm")
        final_norm, call_style = None, "roberta"
        head_path = registry["embedding"][:-1]  # tied lm_head decoder
    elif "distilbert" in hf_name:  # before the bert branch: "distil*bert*"
        from transformers import DistilBertConfig, FlaxDistilBertForMaskedLM

        if small:
            config = DistilBertConfig(vocab_size=vocab, dim=96, n_layers=3,
                                      n_heads=8, hidden_dim=384,
                                      max_position_embeddings=64, dropout=0.0,
                                      attention_dropout=0.0)
        else:
            config = DistilBertConfig(vocab_size=vocab)
        hf_model = FlaxDistilBertForMaskedLM(config, seed=0)
        nlayers, ninp = config.n_layers, config.dim
        nhid = config.hidden_dim
        registry = _distilbert_registry(nlayers)
        ff_tap = lambda i: ("distilbert", "transformer", "layer", str(i),
                            "sa_layer_norm")
        final_norm, call_style = None, "distilbert"
        head_path = registry["embedding"][:-1]  # tied vocab_projector
    elif "bert" in hf_name:
        from transformers import BertConfig, FlaxBertForMaskedLM

        if small:
            config = BertConfig(vocab_size=vocab, hidden_size=96,
                                num_hidden_layers=3, num_attention_heads=8,
                                intermediate_size=384, max_position_embeddings=64,
                                hidden_dropout_prob=0.0,
                                attention_probs_dropout_prob=0.0)
        elif hf_name == "bert-sanity-check":
            # reference bert-sanity-check: full bert-base with ReLU, no dropout
            config = BertConfig(vocab_size=vocab, hidden_act="relu",
                                hidden_dropout_prob=0.0,
                                attention_probs_dropout_prob=0.0)
        else:
            config = BertConfig(vocab_size=vocab)
        hf_model = FlaxBertForMaskedLM(config, seed=0)
        nlayers, ninp = config.num_hidden_layers, config.hidden_size
        nhid = config.intermediate_size
        registry = _bert_registry(nlayers)
        # post-LN: ff_input is the attention-output LayerNorm of block i
        ff_tap = lambda i: ("bert", "encoder", "layer", str(i),
                            "attention", "output", "LayerNorm")
        final_norm, call_style = None, "bert"
        head_path = ("cls", "predictions")
    else:
        raise ValueError(f"Unsupported HF flax model {hf_name}.")

    if getattr(cfg_data, "task", None) == "classification":
        # GLUE-style heads (reference: AutoModelForSequenceClassification,
        # model_preparation.py:101-108). Same trunk/registry; only the head
        # and its gradient path change.
        import transformers

        clf = {"bert": ("FlaxBertForSequenceClassification", ("classifier",)),
               "roberta": ("FlaxRobertaForSequenceClassification",
                           ("classifier", "out_proj")),
               "distilbert": ("FlaxDistilBertForSequenceClassification",
                              ("classifier",))}.get(call_style)
        if clf is None:
            raise ValueError(f"No Flax sequence-classification head for "
                             f"{hf_name} (transformers ships none for gpt2).")
        config.num_labels = int(cfg_data.classes)
        hf_model = getattr(transformers, clf[0])(config, seed=0)
        head_path = clf[1]

    def _walk(tree, path):
        for k in path:
            tree = tree[k]
        return tree

    def _translate_capture(inter):
        """Captured LayerNorm outputs -> {layerN: {ff_input: (arr,)}, features}."""
        out = {}
        for i in range(nlayers):
            try:
                tap = _walk(inter, ff_tap(i))
                out[f"layer{i}"] = {"ff_input": tap["__call__"]}
            except (KeyError, TypeError):
                continue
        try:
            feats = (_walk(inter, final_norm)["__call__"] if final_norm is not None
                     else out[f"layer{nlayers - 1}"]["ff_input"])
            out["features"] = feats
        except (KeyError, TypeError):
            pass
        return out

    flax_module = hf_model.module

    def _call_args(ids):
        mask = jnp.ones_like(ids)
        positions = jnp.broadcast_to(jnp.arange(ids.shape[1])[None], ids.shape)
        if call_style == "bert":  # (ids, mask, token_type_ids, position_ids, head_mask)
            return (ids, mask, jnp.zeros_like(ids), positions, None)
        if call_style == "roberta":
            # HF offsets roberta positions past the padding index
            # (create_position_ids_from_input_ids: pad_token_id + 1 + cumsum)
            return (ids, mask, jnp.zeros_like(ids),
                    positions + config.pad_token_id + 1, None)
        if call_style == "distilbert":  # (ids, mask) only
            return (ids, mask)
        return (ids, mask, positions)

    # HF Flax modules take token ids only (no inputs_embeds) — yet the
    # optimization attacks (TAG etc.) relax over continuous embeddings. Bridge
    # the gap with flax method interception: run on dummy ids and substitute
    # the word-embedding module's output with the candidate embeddings. This
    # is exactly HF's inputs_embeds semantics (word part replaced; position/
    # token-type embeddings and embedding LayerNorm still applied on top).
    emb_module_name = "wte" if call_style == "gpt2" else "word_embeddings"

    def _embed_interceptor(override):
        import flax.linen as nn

        def interceptor(next_fun, args, kwargs, context):
            if (context.module.name == emb_module_name
                    and context.method_name == "__call__"):
                return override.astype(next_fun(*args, **kwargs).dtype)
            return next_fun(*args, **kwargs)

        return nn.intercept_methods(interceptor)

    @dataclasses.dataclass
    class HFJaxModel(JaxModel):
        def apply(self, params, buffers, inputs, train: bool = False, capture: bool = False):
            import contextlib

            inputs = jnp.asarray(inputs)
            if jnp.issubdtype(inputs.dtype, jnp.floating) and inputs.ndim == 3:
                ids = jnp.zeros(inputs.shape[:2], jnp.int32)
                ctx = _embed_interceptor(inputs)
            else:
                ids, ctx = jnp.asarray(inputs, jnp.int32), contextlib.nullcontext()
            variables = {"params": params}
            with ctx:
                if not capture:
                    outputs = flax_module.apply(variables, *_call_args(ids),
                                                deterministic=True)
                    return outputs.logits, {}
                outputs, inter = flax_module.apply(
                    variables, *_call_args(ids), deterministic=True,
                    mutable=["intermediates"],
                    capture_intermediates=lambda mdl, name: name == "__call__"
                    and mdl.__class__.__name__ == "LayerNorm")
            translated = _translate_capture(dict(inter)["intermediates"])
            return outputs.logits, {"intermediates": translated}

        def init_state(self, key, input_example=None):
            example = input_example if input_example is not None else self.input_example
            fresh = type(hf_model)(config, seed=int(jax.random.key_data(key)[-1]) % (2 ** 31))
            return jax.tree_util.tree_map(jnp.asarray, dict(fresh.params)), {}

    example = jnp.zeros((1, int(cfg_data.shape[0])), jnp.int32)
    model = HFJaxModel(
        name=f"hf-{hf_name}", module=flax_module,
        params=jax.tree_util.tree_map(jnp.asarray, dict(hf_model.params)),
        buffers={}, modality="text", head_path=head_path, input_example=example,
        aux=dict(registry=registry, ninp=ninp, nhid=nhid, nlayers=nlayers))
    if pretrained:
        from .model_preparation import _maybe_load_pretrained

        _maybe_load_pretrained(model, cfg_data)
    loss_cls = LOSSES.get(getattr(cfg_data, "task", "causal-lm"), CausalLoss)
    return model, loss_cls()
