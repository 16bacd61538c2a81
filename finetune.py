#!/usr/bin/env python
"""LoRA finetune CLI — fire-style kwargs matching the reference
(finetune.py:153-188,477): every FinetuneConfig field is accepted as
--name value or --name=value.

Smoke run without weights:
  python finetune.py --mock true --data_path tests/fixtures/instruct.json \
      --batch_size 4 --micro_batch_size 2 --num_epochs 1 --max_steps 4 \
      --cutoff_len 64 --output_dir /tmp/lora-out
"""
from __future__ import annotations

import dataclasses
import sys


def _parse_kwargs(argv):
    """Minimal fire.Fire-style --key value/--key=value parser (fire is not in
    this image)."""
    kw = {}
    i = 0
    while i < len(argv):
        arg = argv[i]
        if not arg.startswith("--"):
            raise SystemExit(f"unexpected argument: {arg}")
        key = arg[2:]
        if "=" in key:
            key, val = key.split("=", 1)
            i += 1
        else:
            if i + 1 >= len(argv):
                raise SystemExit(f"missing value for --{key}")
            val = argv[i + 1]
            i += 2
        kw[key] = val
    return kw


def _coerce(val: str, typ):
    import typing
    origin = typing.get_origin(typ)
    if origin is typing.Union:  # Optional[...]
        args = [a for a in typing.get_args(typ) if a is not type(None)]
        typ = args[0] if args else str
    if typ is bool:
        return val.lower() in ("1", "true", "yes")
    if typ is int:
        return int(val)
    if typ is float:
        return float(val)
    return val


def main():
    from radialog_tpu.apps.finetune_lora import FinetuneConfig, train
    from radialog_tpu.core.mesh import init_distributed

    init_distributed()  # multi-host no-op unless RADIALOG_COORDINATOR etc.
    fields = {f.name: f.type for f in dataclasses.fields(FinetuneConfig)}
    raw = _parse_kwargs(sys.argv[1:])
    import typing
    hints = typing.get_type_hints(FinetuneConfig)
    kwargs = {}
    for k, v in raw.items():
        if k not in fields:
            raise SystemExit(f"unknown option --{k}; valid: {sorted(fields)}")
        kwargs[k] = _coerce(v, hints[k])
    cfg = FinetuneConfig(**kwargs)
    print(f"finetune config: {cfg}")
    train(cfg)


if __name__ == "__main__":
    main()
