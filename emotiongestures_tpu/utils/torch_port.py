"""Weight transport between this framework and the reference's torch
checkpoints (SURVEY.md §5 checkpoint row: "import shim for reference
.pth naming").

The generator mapping is declarative — one (torch_key, flax_path, kind)
table — so both directions share it:
  * flax_generator_to_torch_state: our GestureTransformer variables ->
    reference Full_model/Models_memory.Transformer state_dict (used by
    the numerical-parity harness tests/test_torch_parity.py);
  * torch_state_to_flax_generator: a reference .pth state_dict -> our
    variables (checkpoint import; strips DataParallel 'module.' prefixes
    like test_...py:149,159,168).

Layout kinds:
  dense    flax (in, out)          <-> torch (out, in)
  conv2d   flax (kh, kw, in, out)  <-> torch (out, in, kh, kw)
  conv1d   flax (k, in, out)       <-> torch (out, in, k)
  dense1x1 flax dense (in, out)    <-> torch conv1d (out, in, 1)
  g        flax (out,)             <-> torch (out, 1, 1)   [weight-norm g]
  raw      identical layout
"""
from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# transforms per kind: flax -> torch and torch -> flax
# ---------------------------------------------------------------------------

_TO_TORCH = {
    "raw": lambda x: np.asarray(x),
    "dense": lambda x: np.asarray(x).T,
    "conv2d": lambda x: np.transpose(np.asarray(x), (3, 2, 0, 1)),
    "conv1d": lambda x: np.transpose(np.asarray(x), (2, 1, 0)),
    "dense1x1": lambda x: np.asarray(x).T[:, :, None],
    "g": lambda x: np.asarray(x).reshape(-1, 1, 1),
    # flax nn.ConvTranspose (k, in, out), transpose_kernel=False <->
    # torch ConvTranspose1d (in, out, k): torch applies the gradient-style
    # transposed conv, which flips the kernel spatially relative to
    # lax.conv_transpose's correlation (verified empirically in
    # tests/test_torch_parity_baselines.py)
    "convT1d": lambda x: np.ascontiguousarray(
        np.transpose(np.asarray(x)[::-1], (1, 2, 0))),
}
_FROM_TORCH = {
    "raw": lambda x: np.asarray(x),
    "dense": lambda x: np.asarray(x).T,
    "conv2d": lambda x: np.transpose(np.asarray(x), (2, 3, 1, 0)),
    "conv1d": lambda x: np.transpose(np.asarray(x), (2, 1, 0)),
    "dense1x1": lambda x: np.asarray(x)[:, :, 0].T,
    "g": lambda x: np.asarray(x).reshape(-1),
    "convT1d": lambda x: np.ascontiguousarray(
        np.transpose(np.asarray(x), (2, 0, 1))[::-1]),
}


def _linear(table, torch_prefix, flax_path):
    table.append((f"{torch_prefix}.weight", ("params",) + flax_path
                  + ("kernel",), "dense"))
    table.append((f"{torch_prefix}.bias", ("params",) + flax_path
                  + ("bias",), "raw"))


def _seq_linears(table, torch_prefix, flax_base, names, indices=None):
    indices = indices or tuple(range(0, 2 * len(names), 2))
    for name, idx in zip(names, indices):
        _linear(table, f"{torch_prefix}.{idx}", flax_base + (name,))


def _bn(table, torch_prefix, flax_path):
    table.append((f"{torch_prefix}.weight",
                  ("params",) + flax_path + ("BatchNorm_0", "scale"), "raw"))
    table.append((f"{torch_prefix}.bias",
                  ("params",) + flax_path + ("BatchNorm_0", "bias"), "raw"))
    table.append((f"{torch_prefix}.running_mean",
                  ("batch_stats",) + flax_path + ("BatchNorm_0", "mean"),
                  "raw"))
    table.append((f"{torch_prefix}.running_var",
                  ("batch_stats",) + flax_path + ("BatchNorm_0", "var"),
                  "raw"))


def _conv(table, torch_prefix, flax_path, kind="conv2d", bias=True):
    # core.layers.Conv auto-names its inner flax module Conv_0, or
    # ConvTranspose_0 when transpose=True (the convT1d kind)
    child = "ConvTranspose_0" if kind == "convT1d" else "Conv_0"
    table.append((f"{torch_prefix}.weight",
                  ("params",) + flax_path + (child, "kernel"), kind))
    if bias:
        table.append((f"{torch_prefix}.bias",
                      ("params",) + flax_path + (child, "bias"), "raw"))


def _resnet_se(table, torch_prefix, flax_base, layers):
    _conv(table, f"{torch_prefix}.conv1", flax_base + ("conv1",))
    _bn(table, f"{torch_prefix}.bn1", flax_base + ("bn1",))
    for stage, blocks in enumerate(layers):
        for b in range(blocks):
            fb = flax_base + (f"layer{stage + 1}_block{b}",)
            tp = f"{torch_prefix}.layer{stage + 1}.{b}"
            _conv(table, f"{tp}.conv1", fb + ("conv1",), bias=False)
            _conv(table, f"{tp}.conv2", fb + ("conv2",), bias=False)
            _bn(table, f"{tp}.bn1", fb + ("bn1",))
            _bn(table, f"{tp}.bn2", fb + ("bn2",))
            _linear(table, f"{tp}.se.fc.0", fb + ("se", "fc1"))
            _linear(table, f"{tp}.se.fc.2", fb + ("se", "fc2"))
            first_in_stage = b == 0 and (stage > 0)
            if first_in_stage:
                _conv(table, f"{tp}.downsample.0",
                      fb + ("downsample_conv",), bias=False)
                _bn(table, f"{tp}.downsample.1", fb + ("downsample_bn",))


def _mha(table, torch_prefix, flax_base):
    for name in ("w_qs", "w_ks", "w_vs", "fc"):
        table.append((f"{torch_prefix}.{name}.weight",
                      ("params",) + flax_base + (name, "kernel"), "dense"))
    table.append((f"{torch_prefix}.layer_norm.weight",
                  ("params",) + flax_base + ("layer_norm", "scale"), "raw"))
    table.append((f"{torch_prefix}.layer_norm.bias",
                  ("params",) + flax_base + ("layer_norm", "bias"), "raw"))


def _enc_layers(table, torch_prefix, flax_base, n_layers,
                attn_name="slf_attn"):
    for i in range(n_layers):
        fb = flax_base + (f"layer_{i}",)
        tp = f"{torch_prefix}.layer_stack.{i}"
        _mha(table, f"{tp}.{attn_name}", fb + (attn_name,))
        ffn = fb + ("pos_ffn",)
        _linear(table, f"{tp}.pos_ffn.w_1", ffn + ("w_1",))
        _linear(table, f"{tp}.pos_ffn.w_2", ffn + ("w_2",))
        table.append((f"{tp}.pos_ffn.layer_norm.weight",
                      ("params",) + ffn + ("layer_norm", "scale"), "raw"))
        table.append((f"{tp}.pos_ffn.layer_norm.bias",
                      ("params",) + ffn + ("layer_norm", "bias"), "raw"))


def generator_mapping(variables, n_layers: int = 3, tcn_layers: int = 3):
    """(torch_key, flax_path, kind) table for the flagship generator.
    `variables` is consulted only for optional branches (TCN downsample,
    which exists when in/out channel counts differ)."""
    t = []
    p = variables["params"]

    # text encoder
    t.append(("text_encoder.embedding.weight",
              ("params", "text_encoder", "embedding"), "raw"))
    for i in range(tcn_layers):
        fb = ("text_encoder", "tcn", f"block{i}")
        tp = f"text_encoder.tcn.network.{i}"
        for c in ("conv1", "conv2"):
            t.append((f"{tp}.{c}.weight_v",
                      ("params",) + fb + (c, "v"), "conv1d"))
            t.append((f"{tp}.{c}.weight_g",
                      ("params",) + fb + (c, "g"), "g"))
            t.append((f"{tp}.{c}.bias",
                      ("params",) + fb + (c, "bias"), "raw"))
        if "downsample" in p["text_encoder"]["tcn"][f"block{i}"]:
            t.append((f"{tp}.downsample.weight",
                      ("params",) + fb + ("downsample", "kernel"),
                      "dense1x1"))
            t.append((f"{tp}.downsample.bias",
                      ("params",) + fb + ("downsample", "bias"), "raw"))
    _linear(t, "text_encoder.fc1.0", ("text_encoder", "fc1"))
    _linear(t, "text_encoder.decoder", ("text_encoder", "decoder"))

    # audio encoder
    _resnet_se(t, "audio_encoder.feat_extractor",
               ("audio_encoder", "feat_extractor"), [3, 4, 6])
    _conv(t, "audio_encoder.final_conv1", ("audio_encoder", "final_conv1"))
    _bn(t, "audio_encoder.bn1", ("audio_encoder", "bn1"))
    _linear(t, "audio_encoder.fc1", ("audio_encoder", "fc1"))
    _linear(t, "audio_encoder.fc2", ("audio_encoder", "fc2"))

    # prior memory encoder
    pe = ("prior_seq_encoder",)
    _conv(t, "prior_seq_encoder.pred_conv.0", pe + ("pred_conv1",),
          kind="conv1d")
    _bn(t, "prior_seq_encoder.pred_conv.2", pe + ("pred_bn1",))
    _conv(t, "prior_seq_encoder.pred_conv.3", pe + ("pred_conv2",),
          kind="conv1d")
    _bn(t, "prior_seq_encoder.pred_conv.5", pe + ("pred_bn2",))
    _seq_linears(t, "prior_seq_encoder.spatial_memory.spatial_chunk_encoder",
                 pe + ("spatial_memory",), ("enc_fc1", "enc_fc2"))
    _seq_linears(t, "prior_seq_encoder.temporal_memory."
                 "temporal_chunk_encoder",
                 pe + ("temporal_memory",), ("chunk_fc1", "chunk_fc2"))
    _seq_linears(t, "prior_seq_encoder.temporal_memory."
                 "temporal_memory_encoder",
                 pe + ("temporal_memory",), ("mem_fc1", "mem_fc2"))
    _seq_linears(t, "prior_seq_encoder.post_header", pe,
                 ("post_fc1", "post_fc2"))

    # projections & heads
    _seq_linears(t, "emotion_proj", ("emotion_proj",), ("fc1", "fc2"))
    _seq_linears(t, "semantic_proj", ("semantic_proj",), ("fc1", "fc2"))
    _seq_linears(t, "fusion_proj", ("fusion_proj",), ("fc1", "fc2"))
    _seq_linears(t, "emotion_classifer_header", (),
                 ("emotion_clf_fc1", "emotion_clf_fc2", "emotion_clf_fc3",
                  "emotion_clf_fc4"))
    _seq_linears(t, "post_projector", (),
                 ("post_fc1", "post_fc2", "post_fc3", "post_fc4"))

    # transformer stacks
    _enc_layers(t, "encoder", ("encoder",), n_layers, "slf_attn")
    _enc_layers(t, "decoder", ("decoder",), n_layers, "enc_attn")
    return t


def _get(tree, path):
    node = tree
    for key in path:
        node = node[key]
    return node


def _set(tree, path, value):
    node = tree
    for key in path[:-1]:
        node = node[key]
    node[path[-1]] = value


def flax_generator_to_torch_state(variables, n_layers: int = 3,
                                  tcn_layers: int = 3):
    """Our GestureTransformer variables -> reference state_dict
    (numpy values; wrap with `load_into_torch`)."""
    out = {}
    for torch_key, flax_path, kind in generator_mapping(
            variables, n_layers, tcn_layers):
        out[torch_key] = _TO_TORCH[kind](_get(variables, flax_path))
    return out


def torch_state_to_flax_generator(variables, torch_state,
                                  n_layers: int = 3, tcn_layers: int = 3):
    """Reference .pth state_dict -> our variables. `variables` provides
    the template (shapes/paths); returns a new deep-copied tree plus the
    list of torch keys that had no mapping (pos tables, unused norms)."""
    import copy

    torch_state = {k.replace("module.", "", 1): np.asarray(v)
                   for k, v in torch_state.items()}
    new_vars = copy.deepcopy(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]})
    mapped = set()
    for torch_key, flax_path, kind in generator_mapping(
            variables, n_layers, tcn_layers):
        if torch_key not in torch_state:
            raise KeyError(f"reference checkpoint missing {torch_key}")
        value = _FROM_TORCH[kind](torch_state[torch_key])
        expect = np.asarray(_get(variables, flax_path))
        if value.shape != expect.shape:
            raise ValueError(
                f"{torch_key}: shape {value.shape} != {expect.shape}")
        _set(new_vars, flax_path, value.astype(expect.dtype))
        mapped.add(torch_key)
    unmapped = [k for k in torch_state
                if k not in mapped and "num_batches_tracked" not in k]
    return new_vars, unmapped


# ---------------------------------------------------------------------------
# GRU transport (torch nn.GRU <-> flax nn.GRUCell stacks, nn/gru.py)
#
# Gate math parity: torch computes r = s(Wi_r x + bi_r + Wh_r h + bh_r)
# while flax folds the two r/z biases into one i-side bias
# (r = s(Wi_r x + b_ir + Wh_r h)); the n gate carries BOTH biases in both
# frameworks (n = tanh(Wi_n x + b_in + r * (Wh_n h + b_hn))), so the
# mapping is exact: torch->flax sums bi+bh on r/z, flax->torch emits the
# flax bias on the i side and zeros on the h side. Gate order is torch's
# (r, z, n) rows of the stacked (3H, .) weight matrices.
# ---------------------------------------------------------------------------

_GATES_I = ("ir", "iz", "in")
_GATES_H = ("hr", "hz", "hn")


def gru_cell_to_torch(cell: dict):
    """flax GRUCell param subtree -> torch per-layer GRU arrays
    (weight_ih, weight_hh, bias_ih, bias_hh)."""
    w_ih = np.concatenate(
        [np.asarray(cell[g]["kernel"]).T for g in _GATES_I], axis=0)
    w_hh = np.concatenate(
        [np.asarray(cell[g]["kernel"]).T for g in _GATES_H], axis=0)
    hidden = w_hh.shape[1]
    b_ih = np.concatenate(
        [np.asarray(cell[g]["bias"]) for g in _GATES_I], axis=0)
    zeros = np.zeros(hidden, dtype=b_ih.dtype)
    b_hh = np.concatenate(
        [zeros, zeros, np.asarray(cell["hn"]["bias"])], axis=0)
    return w_ih, w_hh, b_ih, b_hh


def torch_to_gru_cell(w_ih, w_hh, b_ih, b_hh) -> dict:
    """Inverse of gru_cell_to_torch (checkpoint import direction)."""
    w_ih, w_hh = np.asarray(w_ih), np.asarray(w_hh)
    b_ih, b_hh = np.asarray(b_ih), np.asarray(b_hh)
    hidden = w_hh.shape[1]

    def row(mat, i):
        return mat[i * hidden:(i + 1) * hidden]

    cell = {}
    for i, (gi, gh) in enumerate(zip(_GATES_I, _GATES_H)):
        cell[gi] = {"kernel": row(w_ih, i).T}
        cell[gh] = {"kernel": row(w_hh, i).T}
        if gi == "in":
            cell[gi]["bias"] = row(b_ih, i)
            cell[gh]["bias"] = row(b_hh, i)
        else:
            # fold both torch biases into flax's single i-side bias
            cell[gi]["bias"] = row(b_ih, i) + row(b_hh, i)
    return cell


def _gru_to_torch(out: dict, torch_prefix: str, gru_params: dict,
                  n_layers: int, bidirectional: bool = False,
                  layer_names=None):
    """Emit torch nn.GRU keys for a flax GRU/GRUCellStack subtree.
    `layer_names(layer, reverse) -> flax child name` defaults to the
    nn/gru.py naming (l{k}_fwd / l{k}_bwd, or l{k} for cell stacks)."""
    if layer_names is None:
        if bidirectional:
            layer_names = lambda k, rev: f"l{k}_{'bwd' if rev else 'fwd'}"
        else:
            layer_names = lambda k, rev: (
                f"l{k}" if f"l{k}" in gru_params else f"l{k}_fwd")
    for k in range(n_layers):
        for rev in ((False, True) if bidirectional else (False,)):
            cell = gru_params[layer_names(k, rev)]
            w_ih, w_hh, b_ih, b_hh = gru_cell_to_torch(cell)
            suffix = f"l{k}" + ("_reverse" if rev else "")
            out[f"{torch_prefix}.weight_ih_{suffix}"] = w_ih
            out[f"{torch_prefix}.weight_hh_{suffix}"] = w_hh
            out[f"{torch_prefix}.bias_ih_{suffix}"] = b_ih
            out[f"{torch_prefix}.bias_hh_{suffix}"] = b_hh


def flax_seq2seq_to_torch_state(variables, n_layers: int = 2):
    """Our baselines.Seq2SeqNet variables -> reference
    model/seq2seq_net.py:217 Seq2SeqNet state_dict (numpy values)."""
    p = variables["params"]
    out = {"encoder.embedding.weight": np.asarray(p["encoder"]["embedding"])}
    _gru_to_torch(out, "encoder.gru", p["encoder"]["gru"], n_layers,
                  bidirectional=True)
    table = []
    dec = ("decoder",)
    _linear(table, "decoder.decoder.pre_linear.0", dec + ("pre_linear",))
    _bn(table, "decoder.decoder.pre_linear.1", dec + ("pre_bn",))
    _linear(table, "decoder.decoder.attn.attn", dec + ("attn", "attn"))
    table.append(("decoder.decoder.attn.v",
                  ("params",) + dec + ("attn", "v"), "raw"))
    _linear(table, "decoder.decoder.out", dec + ("out",))
    for torch_key, flax_path, kind in table:
        out[torch_key] = _TO_TORCH[kind](_get(variables, flax_path))
    _gru_to_torch(out, "decoder.decoder.gru", p["decoder"]["gru"], n_layers)
    return out


def _conv_norm_relu(table, torch_prefix, flax_base, kind="conv1d"):
    """models/baselines/speech2gesture.ConvNormRelu <-> the reference's
    nn.Sequential(conv, bn, leaky_relu) (speech2gesture.py:106-128)."""
    _conv(table, f"{torch_prefix}.0", flax_base + ("conv",), kind=kind)
    _bn(table, f"{torch_prefix}.1", flax_base + ("bn",))


def s2g_generator_mapping():
    """(torch_key, flax_path, kind) table for the speech2gesture
    Generator (model/speech2gesture.py:202-240)."""
    t = []
    ae = ("audio_encoder",)
    for i in range(8):
        _conv_norm_relu(t, f"audio_encoder.first_net.{i}",
                        ae + (f"first_{i}",), kind="conv2d")
    _conv_norm_relu(t, "audio_encoder.down1.0", ae + ("down1_0",))
    _conv_norm_relu(t, "audio_encoder.down1.1", ae + ("down1_1",))
    for i in range(2, 7):
        _conv_norm_relu(t, f"audio_encoder.down{i}", ae + (f"down{i}",))
    for i in range(1, 6):
        _conv_norm_relu(t, f"audio_encoder.up{i}.conv",
                        ae + (f"up{i}", "conv"))
    _linear(t, "pre_pose_encoder.0", ("pre_fc1",))
    _bn(t, "pre_pose_encoder.1", ("pre_bn",))
    _linear(t, "pre_pose_encoder.3", ("pre_fc2",))
    for i in range(4):
        _conv_norm_relu(t, f"decoder.{i}", (f"dec_{i}",))
    t.append(("final_out.weight", ("params", "final_out", "Conv_0",
                                   "kernel"), "conv1d"))
    t.append(("final_out.bias", ("params", "final_out", "Conv_0", "bias"),
              "raw"))
    return t


def s2g_discriminator_mapping():
    """Table for the speech2gesture patch Discriminator
    (model/speech2gesture.py:243-259)."""
    t = []
    _conv(t, "net.0", ("conv1",), kind="conv1d")
    _conv_norm_relu(t, "net.2", ("cnr1",))
    _conv_norm_relu(t, "net.3", ("cnr2",))
    _conv(t, "net.4", ("out",), kind="conv1d")
    return t


def _wav_encoder(table, torch_prefix, flax_base):
    """Trimodal raw-wave encoder (multimodal_context_net.py:13-40)."""
    for i, seq in enumerate((0, 3, 6, 9)):
        _conv(table, f"{torch_prefix}.feat_extractor.{seq}",
              flax_base + (f"conv{i}",), kind="conv1d")
        if i < 3:
            _bn(table, f"{torch_prefix}.feat_extractor.{seq + 1}",
                flax_base + (f"bn{i}",))
    _linear(table, f"{torch_prefix}.fc1.0", flax_base + ("fc1",))


def _tcn(table, params, torch_prefix, flax_base, n_layers):
    """TemporalConvNet transport (model/tcn.py == Full_model/tcn.py):
    weight-normed conv1/conv2 per block, optional 1x1 downsample."""
    for i in range(n_layers):
        fb = flax_base + (f"block{i}",)
        tp = f"{torch_prefix}.network.{i}"
        for c in ("conv1", "conv2"):
            table.append((f"{tp}.{c}.weight_v",
                          ("params",) + fb + (c, "v"), "conv1d"))
            table.append((f"{tp}.{c}.weight_g",
                          ("params",) + fb + (c, "g"), "g"))
            table.append((f"{tp}.{c}.bias",
                          ("params",) + fb + (c, "bias"), "raw"))
        if "downsample" in _get(params, fb):
            table.append((f"{tp}.downsample.weight",
                          ("params",) + fb + ("downsample", "kernel"),
                          "dense1x1"))
            table.append((f"{tp}.downsample.bias",
                          ("params",) + fb + ("downsample", "bias"), "raw"))


def _text_encoder_tcn32(table, params, torch_prefix, flax_base,
                        n_layers):
    """32-d TCN text encoder (multimodal_context_net.py:43-77)."""
    table.append((f"{torch_prefix}.embedding.weight",
                  ("params",) + flax_base + ("embedding",), "raw"))
    _tcn(table, params, torch_prefix + ".tcn", flax_base + ("tcn",),
         n_layers)
    _linear(table, f"{torch_prefix}.fc1.0", flax_base + ("fc1",))
    _linear(table, f"{torch_prefix}.decoder", flax_base + ("decoder",))


def flax_trimodal_generator_to_torch_state(variables, n_layers: int = 4):
    """Our baselines.PoseGenerator (input_context='both', no speaker z)
    -> reference multimodal_context_net.PoseGenerator state_dict."""
    p = {"params": variables["params"]}
    t = []
    _wav_encoder(t, "audio_encoder", ("audio_encoder",))
    _text_encoder_tcn32(t, p["params"], "text_encoder", ("text_encoder",),
                        n_layers)
    _linear(t, "out.0", ("out_fc1",))
    _linear(t, "out.2", ("out_fc2",))
    out = flax_table_to_torch_state(variables, t)
    _gru_to_torch(out, "gru", variables["params"]["gru"], n_layers,
                  bidirectional=True)
    return out


def flax_trimodal_discriminator_to_torch_state(variables,
                                               n_layers: int = 4):
    """baselines.TrimodalDiscriminator -> reference Discriminator
    (multimodal_context_net.py:182-223, no text encoder)."""
    t = []
    _linear(t, "out", ("out",))
    _linear(t, "out2", ("out2",))
    out = flax_table_to_torch_state(variables, t)
    _gru_to_torch(out, "gru", variables["params"]["gru"], n_layers,
                  bidirectional=True)
    return out


def flax_conv_discriminator_to_torch_state(variables):
    """baselines.ConvDiscriminator -> reference ConvDiscriminator
    (multimodal_context_net.py:226-272)."""
    t = []
    for i, seq in enumerate((0, 3, 6)):
        _conv(t, f"pre_conv.{seq}", (f"conv{i}",), kind="conv1d")
        if i < 2:
            _bn(t, f"pre_conv.{seq + 1}", (f"bn{i}",))
    _linear(t, "out", ("out",))
    _linear(t, "out2", ("out2",))
    out = flax_table_to_torch_state(variables, t)
    _gru_to_torch(out, "gru", variables["params"]["gru"], 4,
                  bidirectional=True)
    return out


def _deconv_stack(table, torch_prefix, flax_base):
    """The shared ConvTranspose->Conv tail of PoseDecoderConv
    (embedding_net.py:196-205 == motion_ae.py:94-103): net.0/.3 are
    ConvTranspose1d (kind convT1d — torch stores (in, out, k) with the
    kernel spatially FLIPPED relative to lax.conv_transpose), net.6/.7
    plain convs."""
    for torch_seq, name, kind in ((0, "d1", "convT1d"), (3, "d2", "convT1d"),
                                  (6, "c1", "conv1d"), (7, "c2", "conv1d")):
        _conv(table, f"{torch_prefix}net.{torch_seq}",
              flax_base + (name,), kind=kind)
        if torch_seq in (0, 3):
            _bn(table, f"{torch_prefix}net.{torch_seq + 1}",
                flax_base + (f"bn{1 if torch_seq == 0 else 2}",))


def _pose_encoder_conv(t, tp, base):
    """PoseEncoderConv body shared by embedding_net.py:42-83 and the
    standalone transplant (tp='' -> module tested in isolation, the only
    config the reference can actually RUN: its out_net fan-in of 800 is
    hard-coded for 60-frame inputs while its conv decoder asserts
    length in {34, 64} — the full 'pose'-mode EmbeddingNet forward is
    unrunnable at any length in the vendored reference)."""
    for i in range(3):  # ConvNormRelu triplets (embedding_net.py:45-48)
        _conv(t, f"{tp}net.{i}.0", base + (f"c{i + 1}", "conv"),
              kind="conv1d")
        _bn(t, f"{tp}net.{i}.1", base + (f"c{i + 1}", "bn"))
    _conv(t, f"{tp}net.3", base + ("c4",), kind="conv1d")
    _linear(t, f"{tp}out_net.0", base + ("out1",))
    _bn(t, f"{tp}out_net.1", base + ("bn1",))
    _linear(t, f"{tp}out_net.3", base + ("out2",))
    _bn(t, f"{tp}out_net.4", base + ("bn2",))
    _linear(t, f"{tp}out_net.6", base + ("out3",))
    _linear(t, f"{tp}fc_mu", base + ("fc_mu",))
    _linear(t, f"{tp}fc_logvar", base + ("fc_logvar",))


def _pose_decoder_conv(t, tp, base):
    """PoseDecoderConv (embedding_net.py:166-218), no pre-pose branch."""
    _linear(t, f"{tp}pre_net.0", base + ("pre_fc1",))
    _bn(t, f"{tp}pre_net.1", base + ("pre_bn2",))
    _linear(t, f"{tp}pre_net.3", base + ("pre_fc2",))
    _deconv_stack(t, tp, base)


def flax_pose_encoder_conv_to_torch_state(variables):
    """Standalone baselines.PoseEncoderConv -> reference PoseEncoderConv
    state_dict (runnable at 60 frames where flatten == 800)."""
    t = []
    _pose_encoder_conv(t, "", ())
    return flax_table_to_torch_state(variables, t)


def flax_pose_decoder_conv_to_torch_state(variables):
    """Standalone baselines.PoseDecoderConv -> reference PoseDecoderConv
    state_dict (runnable at length 34/64)."""
    t = []
    _pose_decoder_conv(t, "", ())
    return flax_table_to_torch_state(variables, t)


def flax_embedding_net_pose_to_torch_state(variables):
    """baselines.EmbeddingNet (mode='pose') -> reference EmbeddingNet
    (embedding_net.py:263-316, pose branch: PoseEncoderConv with
    fc_mu/fc_logvar + PoseDecoderConv). Checkpoint-naming parity; the
    reference cannot run this assembly forward (see _pose_encoder_conv),
    so numerical parity is pinned per sub-module instead
    (tests/test_torch_parity_baselines.py)."""
    t = []
    _pose_encoder_conv(t, "pose_encoder.", ("pose_encoder",))
    _pose_decoder_conv(t, "decoder.", ("decoder",))
    return flax_table_to_torch_state(variables, t)


def flax_motion_ae_to_torch_state(variables):
    """baselines.MotionAE -> reference motion_ae.MotionAE state_dict
    (motion_ae.py:118-130; its PoseEncoderConv returns z only — no
    fc_mu/fc_logvar)."""
    t = []
    en = ("encoder",)
    for i in range(3):  # Convs + BNs are direct children in our _Enc
        _conv(t, f"encoder.net.{i}.0", en + (f"c{i}",), kind="conv1d")
        _bn(t, f"encoder.net.{i}.1", en + (f"bn{i}",))
    _conv(t, "encoder.net.3", en + ("c3",), kind="conv1d")
    _linear(t, "encoder.out_net.0", en + ("fc1",))
    _bn(t, "encoder.out_net.1", en + ("fbn1",))
    _linear(t, "encoder.out_net.3", en + ("fc2",))
    _bn(t, "encoder.out_net.4", en + ("fbn2",))
    _linear(t, "encoder.out_net.6", en + ("fc3",))
    de = ("decoder",)
    _linear(t, "decoder.pre_net.0", de + ("pre1",))
    _bn(t, "decoder.pre_net.1", de + ("pbn",))
    _linear(t, "decoder.pre_net.3", de + ("pre2",))
    _deconv_stack(t, "decoder.", de)
    return flax_table_to_torch_state(variables, t)


def flax_hierarchy_wav_encoder_to_torch_state(variables,
                                              speakers: bool = False):
    """baselines.HierarchicalWavEncoder -> reference
    Hierarchical_WavEncoder (hierarchy_net.py:17-26 wrapping
    model/ResNetSE34V2.py:13-181 as `feat_extractor`)."""
    t = []
    _resnet_se(t, "feat_extractor", (), [3, 4, 6, 3])
    for lvl in ("low", "mid", "high"):
        _conv(t, f"feat_extractor.conv_{lvl}", (f"conv_{lvl}",))
        _bn(t, f"feat_extractor.bn_{lvl}", (f"bn_{lvl}",))
        _linear(t, f"feat_extractor.fc_{lvl}", (f"fc_{lvl}",))
    if speakers:
        t.append(("feat_extractor.speaker_embedding.0.weight",
                  ("params", "speaker_embedding"), "raw"))
        _linear(t, "feat_extractor.speaker_embedding.1", ("speaker_fc",))
        _linear(t, "feat_extractor.fc1", ("fc1",))
        _linear(t, "feat_extractor.fc2", ("fc2",))
    return flax_table_to_torch_state(variables, t)


def flax_hierarchy_generator_to_torch_state(variables, n_layers: int = 4,
                                            tcn_layers: int = 4,
                                            speakers: bool = False):
    """baselines.HierarchicalPoseGenerator -> reference
    Hierarchical_PoseGenerator (hierarchy_net.py:68-163)."""
    t = []
    _text_encoder_tcn32(t, variables["params"], "text_encoder",
                        ("text_encoder",), tcn_layers)
    _linear(t, "out.0", ("out_fc1",))
    _linear(t, "out.2", ("out_fc2",))
    if speakers:
        t.append(("speaker_embedding.0.weight",
                  ("params", "speaker_embedding"), "raw"))
        _linear(t, "speaker_embedding.1", ("speaker_fc",))
        _linear(t, "speaker_mu", ("speaker_mu",))
        _linear(t, "speaker_logvar", ("speaker_logvar",))
    out = flax_table_to_torch_state(variables, t)
    _gru_to_torch(out, "gru", variables["params"]["gru"], n_layers,
                  bidirectional=True)
    return out


def flax_hierarchy_discriminator_to_torch_state(variables,
                                                n_layers: int = 4):
    """baselines.HierarchicalDiscriminator -> reference
    Hierarchical_Discriminator (hierarchy_net.py:166-208, no text)."""
    t = []
    _linear(t, "out", ("out",))
    _linear(t, "out2", ("out2",))
    out = flax_table_to_torch_state(variables, t)
    _gru_to_torch(out, "gru", variables["params"]["gru"], n_layers,
                  bidirectional=True)
    return out


def flax_hierarchy_conv_discriminator_to_torch_state(variables):
    """baselines.HierarchicalConvDiscriminator -> reference
    Hierarchical_ConvDiscriminator (hierarchy_net.py:211-255)."""
    t = []
    for i, seq in enumerate((0, 3, 6)):
        _conv(t, f"pre_conv.{seq}", (f"conv{i}",), kind="conv1d")
        if i < 2:
            _bn(t, f"pre_conv.{seq + 1}", (f"bn{i}",))
    _linear(t, "out", ("out",))
    _linear(t, "out2", ("out2",))
    out = flax_table_to_torch_state(variables, t)
    _gru_to_torch(out, "gru", variables["params"]["gru"], 4,
                  bidirectional=True)
    return out


# ---------------------------------------------------------------------------
# Metric / auxiliary nets (the frozen evaluators the eval entry point
# restores, test_...py:148-174) — transplant tables so Emotion-Acc / FGD
# features can be pinned numerically against the actual reference modules.
# ---------------------------------------------------------------------------


def fgd_ae_mapping():
    """(torch_key, flax_path, kind) table for models.fgd_ae.FGDAutoEncoder
    <-> reference model/FGD.py:26-82 MLP_Reconstruct (Encoder/Decoder
    Sequentials with Dropout at odd indices)."""
    t = []
    _seq_linears(t, "Encoder", (), ("enc_fc1", "enc_fc2", "enc_fc3"))
    _seq_linears(t, "Decoder", (), ("dec_fc1", "dec_fc2", "dec_fc3"))
    return t


def flax_fgd_ae_to_torch_state(variables):
    return flax_table_to_torch_state(variables, fgd_ae_mapping())


def emotion_net_mapping():
    """Table for models.emotion_net.EmotionNet <-> reference
    model/audio_emotion_classifer.py:17-49 EmotionNet (4-stage ResNetSE +
    5-layer MLP + last_fc)."""
    t = []
    _resnet_se(t, "emotion_encoder", ("emotion_encoder",), [3, 4, 6, 3])
    _seq_linears(t, "emotion_eocder_fc", (),
                 ("fc0", "fc1", "fc2", "fc3", "fc4"))
    _linear(t, "last_fc", ("last_fc",))
    return t


def flax_emotion_net_to_torch_state(variables):
    return flax_table_to_torch_state(variables, emotion_net_mapping())


def skeleton_classifier_mapping(n_layers: int = 3):
    """Table for models.skeleton_classifier.SkeletonTransformer <->
    reference skeleton_classifer/Models.py:199-283 Transformer. The
    reference Encoder's position_embeddings / trailing layer_norm params
    are unused in its forward (Models.py:240-241 vs :217) and left at
    torch init."""
    t = []
    _linear(t, "prior_seq_encoder.fc1", ("prior_fc1",))
    _linear(t, "prior_seq_encoder.fc2", ("prior_fc2",))
    _seq_linears(t, "post_projector", (),
                 ("post_fc1", "post_fc2", "post_fc3", "post_fc4",
                  "post_fc5"))
    _enc_layers(t, "encoder", ("encoder",), n_layers)
    return t


def flax_skeleton_classifier_to_torch_state(variables, n_layers: int = 3):
    return flax_table_to_torch_state(
        variables, skeleton_classifier_mapping(n_layers))


def cvae_v3_mapping():
    """Table for models.cvae.EmotionCVAEv3 <-> reference
    CAVE/BEAT_CVAE.py:312-460 MLP_Reconstruct_v3. Decoder's two
    ConvTranspose1d (k=3, s=2, p=1, output_padding=1) match flax
    ConvTranspose(padding=((1, 2),), stride 2) exactly up to the convT1d
    kernel flip: both dilate-by-2 then pad (1, 2)."""
    t = []
    enc = ("encoder",)
    for i, seq in enumerate((0, 3, 6, 9)):
        _conv(t, f"Encoder.{seq}", enc + (f"conv{i}",), kind="conv1d")
        _bn(t, f"Encoder.{seq + 2}", enc + (f"bn{i}",))
    _seq_linears(t, "Posterior_Y_embedding", ("y_embed",), ("fc1", "fc2"))
    _seq_linears(t, "fc_mu", ("fc_mu",), ("fc0", "fc1"))
    _seq_linears(t, "fc_var", ("fc_var",), ("fc0", "fc1"))
    _seq_linears(t, "fusion_z_posterior", ("fusion",), ("fc0", "fc1"))
    de = ("decoder",)
    for i, seq in enumerate((0, 3)):
        _conv(t, f"Decoder.{seq}", de + (f"deconv{i}",), kind="convT1d")
        _bn(t, f"Decoder.{seq + 2}", de + (f"bn{i}",))
    for i, seq in enumerate((6, 9)):
        _conv(t, f"Decoder.{seq}", de + (f"conv{i}",), kind="conv1d")
        _bn(t, f"Decoder.{seq + 2}", de + (f"bn{i + 2}",))
    _conv(t, "Decoder.12", de + ("conv_out",), kind="conv1d")
    return t


def flax_cvae_v3_to_torch_state(variables):
    return flax_table_to_torch_state(variables, cvae_v3_mapping())


_CVAE_STACK5 = ("fc0", "fc1", "fc2", "fc3", "fc4")


def cvae_v1_mapping():
    """Table for models.cvae.EmotionCVAEv1 <-> reference
    CAVE/BEAT_CVAE.py:30-154 MLP_Reconstruct (per-frame MLP enc/dec,
    plain fc_mu/fc_var over the flattened 60x32 encoding)."""
    t = []
    _seq_linears(t, "Encoder", ("encoder",), _CVAE_STACK5)
    _seq_linears(t, "Posterior_Y_embedding", ("y_embed",), ("fc1", "fc2"))
    _linear(t, "fc_mu", ("fc_mu", "fc0"))
    _linear(t, "fc_var", ("fc_var", "fc0"))
    _seq_linears(t, "Decoder", ("decoder",), _CVAE_STACK5)
    _seq_linears(t, "fusion_z_posterior", ("fusion",), ("fc0", "fc1"))
    return t


def cvae_v2_mapping():
    """Table for models.cvae.EmotionCVAEv2 <-> reference
    CAVE/BEAT_CVAE.py:157-308 MLP_Reconstruct_v2 (deeper
    fc_mu/fc_var/fusion Sequentials)."""
    t = []
    _seq_linears(t, "Encoder", ("encoder",), _CVAE_STACK5)
    _seq_linears(t, "Posterior_Y_embedding", ("y_embed",), ("fc1", "fc2"))
    _seq_linears(t, "fc_mu", ("fc_mu",), _CVAE_STACK5)
    _seq_linears(t, "fc_var", ("fc_var",), _CVAE_STACK5)
    _seq_linears(t, "Decoder", ("decoder",), _CVAE_STACK5)
    _seq_linears(t, "fusion_z_posterior", ("fusion",),
                 ("fc0", "fc1", "fc2", "fc3"))
    return t


def hand_cvae_mapping():
    """Table for models.cvae.HandCVAE <-> reference
    Full_model/BEAT_CVAE.py:30-149 MLP_Reconstruct (legacy per-frame
    90-d hand CVAE; 90-d pose condition, not a class one-hot)."""
    t = []
    _seq_linears(t, "Encoder", ("encoder",), _CVAE_STACK5)
    _seq_linears(t, "Posterior_Y_embedding", ("y_embed",), ("fc0", "fc1"))
    _linear(t, "fc_mu", ("fc_mu", "fc0"))
    _linear(t, "fc_var", ("fc_var", "fc0"))
    _seq_linears(t, "Decoder", ("decoder",), _CVAE_STACK5)
    _seq_linears(t, "fusion_z_posterior", ("fusion",), ("fc0", "fc1"))
    return t


def pose_discriminator_mapping(n_layers: int = 3):
    """Table for models.discriminator.PoseDiscriminator <-> reference
    Full_model/Models.py:482-510 Pose_Discriminator (3-layer encoder +
    per-frame sigmoid fc head; only typechecks at d_model == 282)."""
    t = []
    _enc_layers(t, "encoder", ("encoder",), n_layers)
    _seq_linears(t, "fc", (), ("fc1", "fc2"))
    return t


def disnet_mapping():
    """Table for models.emotion_net.DisNet <-> reference
    model/audio_emotion_classifer.py:51-70 DisNet."""
    t = []
    _seq_linears(t, "dis_fc", (), ("fc1", "fc2", "fc3"))
    return t


def flax_table_to_torch_state(variables, table):
    """Apply a (torch_key, flax_path, kind) table in the flax->torch
    direction."""
    return {torch_key: _TO_TORCH[kind](_get(variables, flax_path))
            for torch_key, flax_path, kind in table}


def torch_table_to_flax_state(variables, torch_state, table,
                              gru_specs=()):
    """Apply a (torch_key, flax_path, kind) table in the torch->flax
    direction (checkpoint IMPORT — the generic form of
    torch_state_to_flax_generator, usable with any of the *_mapping()
    builders above). `variables` is the shape template; returns
    (new_variables, unmapped_torch_keys). DataParallel 'module.'
    prefixes are stripped like the reference loaders do
    (test_...py:149,159,168).

    `gru_specs` handles torch nn.GRU blocks, which the tables can't
    express (gate folding, not a layout permute): an iterable of
    (torch_prefix, flax_path_to_gru_subtree, n_layers, bidirectional)
    tuples, inverted via torch_to_gru_cell."""
    import copy

    torch_state = {k.replace("module.", "", 1): np.asarray(v)
                   for k, v in torch_state.items()}
    new_vars = copy.deepcopy({k: variables[k] for k in variables
                              if k in ("params", "batch_stats")})
    mapped = set()
    for torch_key, flax_path, kind in table:
        if torch_key not in torch_state:
            raise KeyError(f"reference checkpoint missing {torch_key}")
        value = _FROM_TORCH[kind](torch_state[torch_key])
        expect = np.asarray(_get(variables, flax_path))
        if value.shape != expect.shape:
            raise ValueError(
                f"{torch_key}: shape {value.shape} != {expect.shape}")
        _set(new_vars, flax_path, value.astype(expect.dtype))
        mapped.add(torch_key)
    for torch_prefix, gru_path, n_layers, bidirectional in gru_specs:
        gru_template = _get(variables, ("params",) + tuple(gru_path))
        for k in range(n_layers):
            for rev in ((False, True) if bidirectional else (False,)):
                suffix = f"l{k}" + ("_reverse" if rev else "")
                keys = [f"{torch_prefix}.{w}_{suffix}"
                        for w in ("weight_ih", "weight_hh",
                                  "bias_ih", "bias_hh")]
                for key in keys:
                    if key not in torch_state:
                        raise KeyError(
                            f"reference checkpoint missing {key}")
                cell = torch_to_gru_cell(*(torch_state[k] for k in keys))
                if bidirectional:
                    child = f"l{k}_{'bwd' if rev else 'fwd'}"
                else:
                    child = (f"l{k}" if f"l{k}" in gru_template
                             else f"l{k}_fwd")
                for gate, leaves in cell.items():
                    for leaf, value in leaves.items():
                        path = (("params",) + tuple(gru_path)
                                + (child, gate, leaf))
                        expect = np.asarray(_get(variables, path))
                        if value.shape != expect.shape:
                            raise ValueError(
                                f"{torch_prefix} {child}.{gate}.{leaf}: "
                                f"{value.shape} != {expect.shape}")
                        _set(new_vars, path, value.astype(expect.dtype))
                mapped.update(keys)
    unmapped = [k for k in torch_state
                if k not in mapped and "num_batches_tracked" not in k]
    return new_vars, unmapped


def _torch_load_checked(path, map_location, allow_pickle: bool):
    """torch.load with safe-by-default deserialization: tensors-only
    (`weights_only=True`) first; full pickle — which executes arbitrary
    code from the file — only behind an explicit `allow_pickle=True`
    opt-in (the CLIs expose it as --allow_pickle). Reference-derived
    .pth artifacts are untrusted content (ADVICE r3)."""
    import torch

    try:
        return torch.load(path, map_location=map_location,
                          weights_only=True)
    except Exception as exc:
        if not allow_pickle:
            raise RuntimeError(
                f"{path} is not loadable as a tensors-only checkpoint "
                "(it pickles arbitrary python objects — e.g. the "
                "reference's rich dict checkpoints carrying args/"
                "lang_model, utils/train_utils.py:149-213). Unpickling "
                "an untrusted file executes arbitrary code; re-run with "
                "--allow_pickle (allow_pickle=True) only if you trust "
                f"its origin. torch said: {exc}") from exc
        return torch.load(path, map_location=map_location,
                          weights_only=False)


def load_reference_state_dict(path, map_location="cpu",
                              allow_pickle: bool = False):
    """torch.load a reference checkpoint and return the flat state_dict:
    unwraps the rich-dict 'gen_dict' layout (utils/train_utils.py:168-213)
    when present. 'module.' DataParallel prefixes are left for
    torch_table_to_flax_state / torch_state_to_flax_generator to strip.
    Shared by egtp-convert-checkpoint and the eval CLI's .pth importer so
    layout handling cannot drift between them. Plain state_dicts load
    with weights_only=True; rich-dict layouts pickle arbitrary objects
    and therefore require `allow_pickle=True` (see _torch_load_checked)."""
    raw = _torch_load_checked(path, map_location, allow_pickle)
    if isinstance(raw, dict) and "gen_dict" in raw:
        raw = raw["gen_dict"]
    return raw


def load_reference_dict_checkpoint(path, map_location="cpu",
                                   allow_pickle: bool = False):
    """Load the reference's rich dict checkpoints
    (utils/train_utils.py:168-213): {'args', 'epoch', 'lang_model',
    'speaker_model', 'pose_dim', 'gen_dict' | 'gen_dict_1..3'+'audio_dict'}.
    Returns the raw dict with every state_dict's 'module.' prefixes
    stripped; feed `gen_dict` to torch_state_to_flax_generator or the
    hierarchical dicts to the corresponding baseline ports. These
    checkpoints pickle arbitrary objects (args Namespace, Vocab), so
    loading one requires `allow_pickle=True` (see _torch_load_checked)."""
    checkpoint = _torch_load_checked(path, map_location, allow_pickle)

    def strip(sd):
        return {k.replace("module.", "", 1): v for k, v in sd.items()}

    for key in list(checkpoint.keys()):
        if key.endswith("_dict") or key.startswith("gen_dict"):
            checkpoint[key] = strip(checkpoint[key])
    return checkpoint


def load_into_torch(torch_module, state: dict, strict: bool = False):
    """Load a numpy state dict produced above into a torch module,
    keeping torch-side buffers (pos tables, unused layer norms) as-is."""
    import torch

    current = torch_module.state_dict()
    tensors = {k: torch.tensor(np.ascontiguousarray(v),
                               dtype=current[k].dtype)
               for k, v in state.items() if k in current}
    missing = [k for k in state if k not in current]
    current.update(tensors)
    torch_module.load_state_dict(current)
    return missing
