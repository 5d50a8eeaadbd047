"""`python -m cvsd_tpu.cli` — list the CLI entry points."""

from __future__ import annotations

import importlib
import pkgutil

import cvsd_tpu.cli as cli_pkg


def main() -> None:
    print("cvsd_tpu command-line entry points (python -m cvsd_tpu.cli.<name>):\n")
    for info in sorted(pkgutil.iter_modules(cli_pkg.__path__), key=lambda m: m.name):
        if info.name.startswith("_") or info.name == "common":
            continue
        try:
            mod = importlib.import_module(f"cvsd_tpu.cli.{info.name}")
            doc = (mod.__doc__ or "").strip().splitlines()
            head = doc[0] if doc else ""
        except Exception:
            head = ""
        print(f"  {info.name:<18} {head}")


if __name__ == "__main__":
    main()
