"""Session-owning CLI wrapper: ``python tools/cli.py <config.json>``.

Owns the Ray session (init + shutdown) so that no library code ever does —
the CLAUDE.md invariant keeps ``data_profiler_ray`` importable inside a
driver-owned session (the graft driver calls ``ray.init`` itself before
importing ``__ray_entry__``). Mirrors the reference's ``profiler-mappings``
console script (``/root/reference/main.py:8-18``).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str]) -> int:
    import ray
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    try:
        from data_profiler_ray.__main__ import main as pkg_main
        return pkg_main(argv)
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
