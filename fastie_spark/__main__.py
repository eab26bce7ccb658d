"""CLI entry — the analogue of the reference's ``fastie-cli`` commands
(/root/reference/fastie/cli.py: ``api`` -> run_api, ``demo`` ->
run_web_demo, host/port from infer args):

  python -m fastie_spark api  --vocab vocab.json --task uie --port 8000
  python -m fastie_spark demo --vocab vocab.json --port 7860

Both serve ``POST /v1/ie`` (+ the GET / playground page) via server.py;
``demo`` is the same server with the playground as the primary surface,
mirroring the reference where the Gradio demo wraps the same
``model.predict``. The "model path" analogue is a vocab JSON file:
``{"entity_vocab": [[surface, label], ...],
   "relation_vocab": [[subj, pred, obj], ...],
   "event_vocab": [[etype, [[role, argument], ...]], ...]}``
(--fixture-vocab uses the deterministic built-in vocab instead, for
sandbox runs without an artifact file).
"""

from __future__ import annotations

import argparse
import json


def load_vocab(path: str | None, fixture: bool):
    if fixture:
        from .fixtures import build_vocab

        return build_vocab()
    if not path:
        raise SystemExit("--vocab FILE or --fixture-vocab is required")
    from .scorer import Vocab

    with open(path) as f:
        raw = json.load(f)
    return Vocab(
        entity_vocab=[tuple(x) for x in raw.get("entity_vocab", [])],
        relation_vocab=[tuple(x) for x in raw.get("relation_vocab", [])],
        event_vocab=[
            (etype, [tuple(a) for a in args])
            for etype, args in raw.get("event_vocab", [])
        ],
    )


def main(argv=None):
    p = argparse.ArgumentParser(prog="fastie_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    for cmd in ("api", "demo"):
        c = sub.add_parser(cmd)
        c.add_argument("--vocab", default=None,
                       help="vocab JSON (the model-artifact analogue)")
        c.add_argument("--fixture-vocab", action="store_true",
                       help="use the built-in deterministic vocab")
        c.add_argument("--task", default="uie")
        c.add_argument("--schema", default=None,
                       help="default ie_schema JSON (uie task)")
        c.add_argument("--host", default="127.0.0.1")
        c.add_argument("--port", type=int, default=8000 if cmd == "api" else 7860)
        c.add_argument("--api-key", default=None)
        c.add_argument("--master", default=None)
    # `python -m fastie_spark api config.yaml` — config file as defaults,
    # flags override (the fastie-cli parse_yaml_file launch shape)
    import sys as _sys

    from .config import apply_config_defaults, load_job_config, pop_config_arg

    raw = list(_sys.argv[1:] if argv is None else argv)
    if raw and raw[0] in ("api", "demo"):
        config_path, rest = pop_config_arg(raw[1:])
        if config_path:
            apply_config_defaults(sub.choices[raw[0]],
                                  load_job_config(config_path), config_path)
            argv = [raw[0]] + rest
    args = p.parse_args(argv)

    from .server import create_server
    from .session import get_spark

    spark = get_spark(master=args.master, app_name=f"fastie_spark_{args.cmd}")
    vocab = load_vocab(args.vocab, args.fixture_vocab)
    schema = json.loads(args.schema) if args.schema else None
    srv = create_server(spark, vocab, task=args.task, default_schema=schema,
                        host=args.host, port=args.port, api_key=args.api_key)
    host, port = srv.server_address
    print(f"Serving POST http://{host}:{port}/v1/ie "
          f"(playground at http://{host}:{port}/) — Ctrl-C to stop.")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.server_close()
        spark.stop()


if __name__ == "__main__":
    main()
