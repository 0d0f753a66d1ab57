"""CLI: ``python -m data_profiler_ray <config.json>`` — the reference's
``profiler-mappings`` console script (``/root/reference/main.py:8-18``,
``pyproject.toml:88-89``): read config (JSON string or file path), run the
dispatched profile, write outputs, emit the RDF mapping template if asked.
"""

from __future__ import annotations

import json
import os
import sys

# minimal RML template (reference ships per-type TTL templates under
# stelardataprofiler/mappings/ and rewrites the JSON-path placeholder,
# profiler.py:41-102; the placeholder contract is preserved here)
_RML_TEMPLATE = """@prefix rml: <http://semweb.mmlab.be/ns/rml#> .
@prefix ql: <http://semweb.mmlab.be/ns/ql#> .
@prefix rr: <http://www.w3.org/ns/r2rml#> .

<#ProfileMapping>
  rml:logicalSource [
    rml:source "{json_path}" ;
    rml:referenceFormulation ql:JSONPath ;
    rml:iterator "$" ;
  ] ;
  rr:subjectMap [ rr:template "profile/{{table.profiler_type}}" ] .
"""


def read_config(arg: str) -> dict:
    """JSON string or file path → dict (reference utils.py:8-25)."""
    if os.path.exists(arg):
        with open(arg) as f:
            return json.load(f)
    return json.loads(arg)


def prepare_mapping(config: dict) -> str | None:
    """Write the RML mapping TTL next to the profile JSON when
    ``output.rdf`` is configured (reference profiler.py:41-102)."""
    out = config.get("output", {})
    if not out.get("rdf"):
        return None
    json_path = out.get("json", "./out/profile.json")
    ttl_path = out["rdf"]
    os.makedirs(os.path.dirname(os.path.abspath(ttl_path)), exist_ok=True)
    with open(ttl_path, "w") as f:
        f.write(_RML_TEMPLATE.replace("{json_path}", json_path))
    return ttl_path


def main(argv: list[str]) -> int:
    if len(argv) != 1:
        print("usage: python -m data_profiler_ray <config.json|json-string>",
              file=sys.stderr)
        return 2
    # NOTE: no ray.init()/ray.shutdown() here — library code never owns a
    # Ray session (CLAUDE.md invariant). Ray Data auto-initialises on first
    # use when run standalone; session-owning entry points live in
    # tools/cli.py (and bench.py / tests/conftest.py).
    config = read_config(argv[0])
    from .api import run_profile
    run_profile(config)
    prepare_mapping(config)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
