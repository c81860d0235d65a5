"""Pipeline configuration with the reference's monoid override chain.

Re-expression of /root/reference/src/HNormalise/Config.hs: a config is
loaded as user ⊕ system ⊕ defaults where the LEFTMOST defined value
wins per field (Config.hs:231-251; defaults :180-224). Sockets/ports
become table/sink URIs here; the ``fields`` output projection drives
jsonout.encode_normalised (Config.hs:205 / Internal.hs:110).

YAML is optional (import-guarded); dicts/JSON work everywhere.
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field


@dataclass
class InputConfig:
    # canonical tokenized table (BASELINE.json input_hint) or raw lines
    path: str | None = None
    format: str = "parquet"           # parquet | text | json (rsyslog %jsonmesg%)
    tokenized: bool = True            # (doc_id,tokens,n_tok,source) vs raw lines


@dataclass
class SinkConfig:
    # the success/failure/counts fan-out (ZeroMQ ports in the reference,
    # Config.hs:93-124; durable tables here)
    out_dir: str | None = None
    json_line: bool = True
    export_sinks: bool = False


@dataclass
class RunConfig:
    streaming: bool = False
    repartition: int = 0
    enrich: bool = False
    # counter print frequency (Config.hs:80, default 100000) — kept for
    # parity; batch mode reports once per run via observed metrics
    frequency: int = 100000


@dataclass
class PipelineConfig:
    input: InputConfig = field(default_factory=InputConfig)
    sink: SinkConfig = field(default_factory=SinkConfig)
    run: RunConfig = field(default_factory=RunConfig)
    # output-field projection: list of [out_key, envelope_field] pairs
    # (Maybe [(Text, Text)], Internal.hs:110); None = default projection
    fields: list[tuple[str, str]] | None = None


def _merge_section(cls, *layers: dict):
    """Leftmost-defined-wins per field (the reference's <> on Maybe)."""
    kwargs = {}
    for f in dataclasses.fields(cls):
        for layer in layers:
            if layer and f.name in layer and layer[f.name] is not None:
                kwargs[f.name] = layer[f.name]
                break
    return cls(**kwargs)


def merge_configs(*layers: dict) -> PipelineConfig:
    """user ⊕ system ⊕ defaults (Config.hs:245-251): earlier layers
    override later ones field-by-field; dataclass defaults are the
    final fallback."""
    cfg = PipelineConfig(
        input=_merge_section(InputConfig, *[d.get("input") for d in layers]),
        sink=_merge_section(SinkConfig, *[d.get("sink") for d in layers]),
        run=_merge_section(RunConfig, *[d.get("run") for d in layers]),
    )
    for layer in layers:
        if layer and layer.get("fields") is not None:
            cfg.fields = [tuple(p) for p in layer["fields"]]
            break
    return cfg


def load_config(user_path: str | None = None, system_path: str | None = None) -> PipelineConfig:
    """Load + merge config files (YAML if available, else JSON)."""
    layers = []
    for p in (user_path, system_path):
        if p and os.path.exists(p):
            layers.append(_read_file(p))
    return merge_configs(*layers) if layers else PipelineConfig()


def _read_file(path: str) -> dict:
    with open(path) as fh:
        text = fh.read()
    try:
        import yaml  # type: ignore

        return yaml.safe_load(text) or {}
    except ImportError:
        return json.loads(text)
