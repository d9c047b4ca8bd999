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
}
_FROM_TORCH = {
    "raw": lambda x: np.asarray(x),
    "dense": lambda x: np.asarray(x).T,
    "conv2d": lambda x: np.transpose(np.asarray(x), (2, 3, 1, 0)),
    "conv1d": lambda x: np.transpose(np.asarray(x), (2, 1, 0)),
    "dense1x1": lambda x: np.asarray(x)[:, :, 0].T,
    "g": lambda x: np.asarray(x).reshape(-1),
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
    table.append((f"{torch_prefix}.weight",
                  ("params",) + flax_path + ("Conv_0", "kernel"), kind))
    if bias:
        table.append((f"{torch_prefix}.bias",
                      ("params",) + flax_path + ("Conv_0", "bias"), "raw"))


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


def load_reference_dict_checkpoint(path, map_location="cpu"):
    """Load the reference's rich dict checkpoints
    (utils/train_utils.py:168-213): {'args', 'epoch', 'lang_model',
    'speaker_model', 'pose_dim', 'gen_dict' | 'gen_dict_1..3'+'audio_dict'}.
    Returns the raw dict with every state_dict's 'module.' prefixes
    stripped; feed `gen_dict` to torch_state_to_flax_generator or the
    hierarchical dicts to the corresponding baseline ports."""
    import torch

    checkpoint = torch.load(path, map_location=map_location,
                            weights_only=False)

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
