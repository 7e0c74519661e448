"""CLI batch runner — the engine's ``oetl.sh`` equivalent (SURVEY §3.1).

    python -m orientdb_etl_spark config.json -name=value ...

``-name=value`` arguments become context variables before config parsing,
exactly as the reference's argv handling (OETLProcessor.java:217-219).
Exit code 0 on success; 1 on halt/validation failure.
"""

from __future__ import annotations

import json
import sys


def main(argv: list[str] | None = None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    config_path = None
    variables: dict[str, str] = {}
    for a in argv:
        if a.startswith("-") and "=" in a:
            name, _, value = a.lstrip("-").partition("=")
            variables[name] = value
        elif config_path is None:
            config_path = a
        else:
            print(f"unexpected argument: {a!r}", file=sys.stderr)
            return 2
    if config_path is None:
        print(__doc__, file=sys.stderr)
        return 2

    from orientdb_etl_spark import Pipeline
    from orientdb_etl_spark.operators.core import ETLHaltError

    try:
        pipeline = Pipeline(config_path, variables=variables)
        result = pipeline.run()
    except ETLHaltError as exc:
        print(f"HALTED: {exc}", file=sys.stderr)
        return 1
    stats = result.stats
    print(
        json.dumps(
            {
                "status": "ok",
                "rows_loaded": stats.rows_loaded,
                "warnings": stats.warnings,
                "errors": stats.errors,
                "notes": stats.notes,
                "outputs": sorted(result.outputs),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
