"""Command-line interface: build / run / inspect.

Reference: xorq's CLI (cli.py:233 build_command, :306 run_command).

  python -m xorq_spark build script.py -e expr_var [--builds-dir builds]
  python -m xorq_spark run builds/<hash> [-o out] [--format parquet|csv|json|text]
  python -m xorq_spark inspect builds/<hash>
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys


def _load_script_expr(script: str, expr_name: str):
    spec = importlib.util.spec_from_file_location("__xorq_build_script__", script)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    try:
        return getattr(mod, expr_name)
    except AttributeError:
        raise SystemExit(
            f"script {script!r} has no attribute {expr_name!r}; "
            f"available: {[k for k, v in vars(mod).items() if not k.startswith('_')]}"
        )


def cmd_build(args) -> int:
    from xorq_spark.builds import build

    expr = _load_script_expr(args.script, args.expr)
    out = build(expr, args.builds_dir)
    print(out)
    return 0


def _parse_params(pairs) -> dict:
    out = {}
    for p in pairs or []:
        k, _, v = p.partition("=")
        try:
            out[k] = json.loads(v)
        except json.JSONDecodeError:
            out[k] = v
    return out


def cmd_run(args) -> int:
    from xorq_spark.builds import load, load_profile

    spark = load_profile(args.build_dir)
    expr = load(args.build_dir, spark)
    params = _parse_params(getattr(args, "param", None))
    if params:
        from xorq_spark.expr.core import _bind_tree_params

        expr = type(expr)(_bind_tree_params(expr.node, params), spark)
    if args.output and args.format == "parquet":
        expr.to_parquet(args.output, spark)
    elif args.output and args.format == "csv":
        expr.to_csv(args.output, spark)
    elif args.output and args.format == "json":
        expr.to_json(args.output, spark)
    else:
        pdf = expr.execute(spark)
        print(pdf.to_string(index=False, max_rows=args.limit))
    return 0


def cmd_uv(args) -> int:
    """`uv build` / `uv run` (reference: cli.py uv_build_command /
    uv_run_command): same build artifacts, but `uv run` re-executes the
    build inside a uv-resolved environment pinned by the build's
    requirements.txt — reproducible dependency resolution across
    machines. Gated on the `uv` binary being installed."""
    import shutil
    import subprocess

    if args.uv_cmd == "build":
        # a build already pins interpreter+library versions into
        # requirements.txt/metadata.json; uv adds nothing at build time
        return cmd_build(args)
    uv = shutil.which("uv")
    if uv is None:
        raise ImportError(
            "`uv run` needs the uv binary (https://docs.astral.sh/uv/) on PATH"
        )
    req = os.path.join(args.build_dir, "requirements.txt")
    cmd = [
        uv, "run", "--with-requirements", req,
        sys.executable, "-m", "xorq_spark", "run", args.build_dir,
    ]
    if args.output:
        cmd += ["-o", args.output]
    return subprocess.call(cmd)


def cmd_run_cached(args) -> int:
    """`run-cached` (reference: cli.py run_cached_command): run a build
    THROUGH the content-addressed cache — the first invocation computes
    and lands the artifact, every later one replays it without touching
    the sources."""
    from xorq_spark.builds import load, load_profile

    spark = load_profile(args.build_dir)
    expr = load(args.build_dir, spark).cache()
    if args.output:
        expr.to_parquet(args.output, spark)
    else:
        print(expr.execute(spark).to_string(index=False, max_rows=args.limit))
    return 0


def cmd_pin(args) -> int:
    """Freeze (pin) or thaw (unpin) the caches of a build artifact —
    reference cli.py:1259 pin_command / apply_pin_transform: pinning
    replaces each materialized CachedNode with a CacheTag (a direct
    read of its cache artifact that still carries the subtree);
    unpinning is the inverse. Without --ensure-materialized a cold
    cache is a clean CLI error, not an implicit expensive run."""
    from xorq_spark.builds import build, load, load_profile
    from xorq_spark.cache import ColdCacheError, pin, unpin

    spark = load_profile(args.build_dir)
    expr = load(args.build_dir, spark)
    if args.cmd == "pin":
        try:
            expr = pin(
                expr,
                ensure_materialized=bool(
                    getattr(args, "ensure_materialized", False)
                ),
            )
        except ColdCacheError as e:
            print(
                f"error: {e}\nPopulate the caches first (python -m "
                f"xorq_spark run-cached {args.build_dir}) or pass "
                "--ensure-materialized/-e.",
                file=sys.stderr,
            )
            return 1
    else:
        expr = unpin(expr)
    out = build(expr, args.builds_dir)
    print(out)
    return 0


def cmd_serve_unbound(args) -> int:
    """`serve-unbound` (reference: cli.py unbind_and_serve_command):
    replace the build's source reads with an unbound placeholder and
    serve over Flight do_exchange — clients stream a table in, the
    expression's transformations run on it, results stream back."""
    from xorq_spark.builds import load, load_profile
    from xorq_spark.flight import flight_serve, unbind

    spark = load_profile(args.build_dir)
    expr = unbind(load(args.build_dir, spark), args.unbound_name)
    server = flight_serve(
        expr, spark, name=args.name, unbound_name=args.unbound_name,
        location=f"grpc://0.0.0.0:{args.port}",
    )
    print(f"serving unbound {args.name!r} at {server.endpoint} (ctrl-c to stop)")
    import threading

    try:
        threading.Event().wait()
    except KeyboardInterrupt:  # pragma: no cover
        server.shutdown()
    return 0


def cmd_run_unbound(args) -> int:
    """`run-unbound` (reference: cli.py run_unbound_command): client
    side of serve-unbound — send a local parquet file through a served
    unbound expression and save/print the exchanged result."""
    import pyarrow.parquet as pq

    from xorq_spark.flight import flight_exchange

    table = pq.read_table(args.input)
    out = flight_exchange(args.endpoint, args.name, table)
    if args.output:
        pq.write_table(out, args.output)
        print(args.output)
    else:
        print(out.to_pandas().to_string(index=False, max_rows=args.limit))
    return 0


def cmd_serve(args) -> int:
    from xorq_spark.builds import load, load_profile
    from xorq_spark.flight import flight_serve

    spark = load_profile(args.build_dir)
    expr = load(args.build_dir, spark)
    server = flight_serve(
        expr, spark, name=args.name, location=f"grpc://0.0.0.0:{args.port}"
    )
    print(f"serving {args.name!r} at {server.endpoint} (ctrl-c to stop)")
    import threading

    try:
        threading.Event().wait()
    except KeyboardInterrupt:  # pragma: no cover
        server.shutdown()
    return 0


def cmd_inspect(args) -> int:
    with open(os.path.join(args.build_dir, "metadata.json")) as f:
        meta = json.load(f)
    print(json.dumps(meta, indent=2))
    with open(os.path.join(args.build_dir, "expr.yaml")) as f:
        print(f.read())
    # SQL view of the plan when the IR is SQL-expressible (loads the
    # artifact without a Spark session — compilation is session-free)
    try:
        from xorq_spark.builds import load
        from xorq_spark.sql_compile import SqlCompileError, to_sql

        print("-- sql --")
        print(to_sql(load(args.build_dir)))
    except SqlCompileError as e:
        print(f"-- sql: not SQL-expressible ({e}) --")
    return 0


def cmd_catalog(args) -> int:
    from xorq_spark import catalog as cat

    root = args.root
    if args.catalog_cmd == "add":
        expr = _load_script_expr(args.script, args.expr)
        h = cat.add(args.name, expr, root)
        print(h)
    elif args.catalog_cmd == "ls":
        for name, h in sorted(cat.ls(root).items()):
            print(f"{name}\t{h}")
    elif args.catalog_cmd == "history":
        for v in cat.history(args.name, root):
            print(f"{v['added_at']}\t{v['hash']}")
    elif args.catalog_cmd == "rm":
        cat.rm(args.name, root)
    elif args.catalog_cmd == "push":
        for h in cat.Annex(args.remote, root=root).push(args.name):
            print(h)
    elif args.catalog_cmd == "pull":
        for h in cat.Annex(args.remote, root=root).pull(args.name):
            print(h)
    elif args.catalog_cmd == "snapshot":
        fp = cat.snapshot(args.name, root=root)
        print(json.dumps(fp, sort_keys=True))
    elif args.catalog_cmd == "tui":
        from xorq_spark.catalog_tui import run_tui

        return run_tui(root)
    elif args.catalog_cmd == "replay":
        if args.name:
            reports = {args.name: cat.replay(args.name, root=root)}
        else:
            reports = cat.replay_all(root)
        drifted = 0
        for name, rep in sorted(reports.items()):
            status = (
                "ok" if rep["match"]
                else "skip" if rep["match"] is None
                else "DRIFT(" + ",".join(rep["drift"]) + ")"
            )
            print(f"{name}\t{status}")
            drifted += rep["match"] is False
        return 1 if drifted else 0
    return 0


def cmd_profile(args) -> int:
    from xorq_spark.profiles import Profile, Profiles

    d = args.dir
    if args.profile_cmd == "add":
        kwargs = dict(kv.split("=", 1) for kv in (args.set or []))
        prof = Profile.new(args.backend, **kwargs)
        path = prof.save(profile_dir=d, alias=args.alias, clobber=args.force)
        print(path)
    elif args.profile_cmd == "ls":
        for name in Profiles(d).list():
            print(name)
    elif args.profile_cmd == "show":
        print(Profile.load(args.name, d).as_yaml(), end="")
    elif args.profile_cmd == "rm":
        from xorq_spark.profiles import default_profile_dir
        from pathlib import Path

        target = Path(d or default_profile_dir()) / f"{args.name}.yaml"
        target.unlink()
    return 0


def cmd_init(args) -> int:
    from xorq_spark.init_templates import init_project

    root = init_project(args.path, args.template)
    print(root)
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="xorq_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="serialize an expression to a build dir")
    b.add_argument("script")
    b.add_argument("-e", "--expr", required=True, help="module-level Expr variable")
    b.add_argument("--builds-dir", default="builds")
    b.set_defaults(fn=cmd_build)

    r = sub.add_parser("run", help="load a build and execute it")
    r.add_argument("build_dir")
    r.add_argument("-o", "--output", default=None)
    r.add_argument("--format", default="parquet", choices=["parquet", "csv", "json", "text"])
    r.add_argument("--limit", type=int, default=50)
    r.add_argument("-p", "--param", action="append", metavar="NAME=VALUE",
                   help="bind a named scalar parameter (JSON or string value)")
    r.set_defaults(fn=cmd_run)

    s = sub.add_parser("serve", help="serve a build over Arrow Flight")
    s.add_argument("build_dir")
    s.add_argument("--name", default="expr")
    s.add_argument("--port", type=int, default=8815)
    s.set_defaults(fn=cmd_serve)

    uvp = sub.add_parser("uv", help="uv-pinned build/run (gated on the uv binary)")
    uvsub = uvp.add_subparsers(dest="uv_cmd", required=True)
    uvb = uvsub.add_parser("build", help="build (env pins are always recorded)")
    uvb.add_argument("script")
    uvb.add_argument("-e", "--expr", required=True)
    uvb.add_argument("--builds-dir", default="builds")
    uvb.set_defaults(fn=cmd_uv)
    uvr = uvsub.add_parser("run", help="run a build inside a uv-resolved env")
    uvr.add_argument("build_dir")
    uvr.add_argument("-o", "--output", default=None)
    uvr.set_defaults(fn=cmd_uv)

    rc = sub.add_parser("run-cached", help="run a build through the cache layer")
    rc.add_argument("build_dir")
    rc.add_argument("-o", "--output", default=None)
    rc.add_argument("--limit", type=int, default=50)
    rc.set_defaults(fn=cmd_run_cached)

    su = sub.add_parser(
        "serve-unbound",
        help="unbind a build's sources and serve it over Flight do_exchange",
    )
    su.add_argument("build_dir")
    su.add_argument("--name", default="expr")
    su.add_argument("--unbound-name", dest="unbound_name", default="input")
    su.add_argument("--port", type=int, default=8815)
    su.set_defaults(fn=cmd_serve_unbound)

    ru = sub.add_parser(
        "run-unbound",
        help="send a parquet file through a served unbound expression",
    )
    ru.add_argument("endpoint", help="grpc://host:port")
    ru.add_argument("input", help="parquet file to stream in")
    ru.add_argument("--name", default="expr")
    ru.add_argument("-o", "--output", default=None)
    ru.add_argument("--limit", type=int, default=50)
    ru.set_defaults(fn=cmd_run_unbound)

    c = sub.add_parser("catalog", help="named, versioned pipeline registry")
    csub = c.add_subparsers(dest="catalog_cmd", required=True)
    ca = csub.add_parser("add", help="build a script's expr into the catalog")
    ca.add_argument("script")
    ca.add_argument("-e", "--expr", default="expr")
    ca.add_argument("--name", required=True)
    ca.add_argument("--root", default=None)
    cl = csub.add_parser("ls", help="list entries (name -> latest hash)")
    cl.add_argument("--root", default=None)
    ch = csub.add_parser("history", help="version history of an entry")
    ch.add_argument("name")
    ch.add_argument("--root", default=None)
    cr = csub.add_parser("rm", help="remove an entry, pruning unreferenced builds")
    cr.add_argument("name")
    cr.add_argument("--root", default=None)
    for verb, hlp in (("push", "ship builds to a shared remote"),
                      ("pull", "fetch builds from a shared remote")):
        cp = csub.add_parser(verb, help=hlp)
        cp.add_argument("remote")
        cp.add_argument("--name", default=None)
        cp.add_argument("--root", default=None)
    ct = csub.add_parser("tui", help="interactive catalog browser")
    ct.add_argument("--root", default=None)
    cs = csub.add_parser(
        "snapshot", help="record an entry's result fingerprint"
    )
    cs.add_argument("name")
    cs.add_argument("--root", default=None)
    crp = csub.add_parser(
        "replay",
        help="re-execute entries against current sources, diff vs snapshot",
    )
    crp.add_argument("name", nargs="?", default=None)
    crp.add_argument("--root", default=None)
    c.set_defaults(fn=cmd_catalog)

    for verb, hlp in (
        ("pin", "freeze a build's caches into direct artifact reads"),
        ("unpin", "thaw a pinned build's CacheTags back to live caches"),
    ):
        pp = sub.add_parser(verb, help=hlp)
        pp.add_argument("build_dir")
        pp.add_argument("--builds-dir", default="builds",
                        help="directory for the resulting build artifact")
        if verb == "pin":
            pp.add_argument("-e", "--ensure-materialized",
                            action="store_true",
                            help="materialize cold caches before pinning")
        pp.set_defaults(fn=cmd_pin)

    i = sub.add_parser("inspect", help="print build metadata + IR")
    i.add_argument("build_dir")
    i.set_defaults(fn=cmd_inspect)

    pr = sub.add_parser("profile", help="saved connection profiles")
    psub = pr.add_subparsers(dest="profile_cmd", required=True)
    pa = psub.add_parser("add", help="create + save a profile")
    pa.add_argument("--backend", required=True, choices=["spark", "duckdb", "sqlite"])
    pa.add_argument("--alias", default=None)
    pa.add_argument("--set", action="append", metavar="KEY=VALUE",
                    help="connection kwarg; use '${ENV_VAR}' for secrets")
    pa.add_argument("--force", action="store_true")
    pa.add_argument("--dir", default=None)
    pl = psub.add_parser("ls", help="list saved profiles")
    pl.add_argument("--dir", default=None)
    ps = psub.add_parser("show", help="print a profile's YAML")
    ps.add_argument("name")
    ps.add_argument("--dir", default=None)
    prm = psub.add_parser("rm", help="delete a profile file/alias")
    prm.add_argument("name")
    prm.add_argument("--dir", default=None)
    pr.set_defaults(fn=cmd_profile)

    init = sub.add_parser("init", help="scaffold a new project directory")
    init.add_argument("path")
    init.add_argument("--template", default="pipeline", choices=["pipeline", "ml"])
    init.set_defaults(fn=cmd_init)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
