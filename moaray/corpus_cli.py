"""CLI for the incremental corpus store: ``python -m moaray.corpus_cli``.

Subcommands mirror pipelines/corpus.py one-to-one so the store is
driveable without writing a script:

    python -m moaray.corpus_cli init    OUT --input docs.parquet
    python -m moaray.corpus_cli append  OUT --input new.jsonl --generation 2
    python -m moaray.corpus_cli compact OUT --generation 9 [--gc]
    python -m moaray.corpus_cli stats   OUT

Inputs go through sources/docs.py read_documents (parquet / jsonl(.gz) /
csv). The CLI owns the Ray session only when none exists (the same
discipline as moaray/cli.py — the library never calls ray.init)."""

from __future__ import annotations

import argparse
import json
import sys


def get_cmdargs(argv=None):
    p = argparse.ArgumentParser(prog="moaray.corpus_cli")
    p.add_argument("command",
                   choices=["init", "append", "compact", "stats"])
    p.add_argument("out_dir", help="store directory (local or s3://)")
    p.add_argument("-i", "--input",
                   help="documents file (parquet/jsonl/csv) for "
                        "init/append")
    p.add_argument("-g", "--generation", type=int,
                   help="fresh generation id for append/compact")
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("-n", "--n-partitions", type=int, default=16)
    p.add_argument("--gc", action="store_true",
                   help="compact: delete superseded files after the swap")
    p.add_argument("--numcpus", type=int, default=None,
                   help="ray.init(num_cpus=...) when Ray is not "
                        "already up")
    return p.parse_args(argv)


def main_cmd(argv=None) -> int:
    args = get_cmdargs(argv)

    import ray

    owns_ray = not ray.is_initialized()
    if owns_ray:
        kw = {"include_dashboard": False}
        if args.numcpus:
            kw["num_cpus"] = args.numcpus
        ray.init(address="local", **kw)
    try:
        from .pipelines.corpus import (corpus_append, corpus_compact,
                                       corpus_init, corpus_stats)
        from .sources.docs import read_documents

        if args.command == "stats":
            print(json.dumps(corpus_stats(args.out_dir), indent=2))
            return 0
        if args.command == "compact":
            if args.generation is None:
                print("compact requires --generation", file=sys.stderr)
                return 2
            res = corpus_compact(args.out_dir, args.generation,
                                 id_col=args.id_col,
                                 n_partitions=args.n_partitions,
                                 gc=args.gc)
            print(json.dumps(res))
            return 0
        if not args.input:
            print(f"{args.command} requires --input", file=sys.stderr)
            return 2
        if args.command == "append" and args.generation is None:
            print("append requires --generation", file=sys.stderr)
            return 2
        docs = read_documents(args.input)
        if args.command == "init":
            res = corpus_init(docs, args.out_dir,
                              text_col=args.text_col,
                              id_col=args.id_col,
                              n_partitions=args.n_partitions)
        else:
            res = corpus_append(docs, args.out_dir, args.generation,
                                text_col=args.text_col,
                                id_col=args.id_col,
                                n_partitions=args.n_partitions)
        print(json.dumps(res))
        return 0
    finally:
        if owns_ray:
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main_cmd())
