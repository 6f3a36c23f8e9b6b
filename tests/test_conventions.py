"""Repo-wide convention guards (pure AST, no Spark session).

The worker-closure pickling rule: a nested function handed to
mapInPandas/applyInPandas/mapInArrow is cloudpickled BY VALUE, but any
module-level function it references is pickled BY REFERENCE — and an
external driver (the attestation harness) has the repo only on the
DRIVER's sys.path, so executors cannot import ez_cdc_spark and the job
dies deserializing. Modules whose helpers are called from worker closures
must therefore opt into cloudpickle.register_pickle_by_value (multimodal
and sketches do). This test re-runs the audit that caught the a14 failure
so the next module can't regress it silently.
"""

import ast
import pathlib

ROOT = pathlib.Path(__file__).resolve().parents[1] / "ez_cdc_spark"

# Nested functions that execute on the DRIVER, where ez_cdc_spark is
# importable — module references from them are fine:
#   apply     — foreachBatch callbacks (driver-side by the Streaming API)
#   appender  — s33's ThreadPoolExecutor task (driver threads, never
#               cloudpickled; it drives retry_commit/publish_append)
#   _touched / _overlaps — merge_cow's metadata pruning helpers: pure
#               driver-side binary search over manifest stats, never
#               handed to a Spark worker API
#   _retained_files — vacuum's manifest-reference scan: pure driver-side
#               filesystem/JSON walking, no Spark at all
#   _reserved_dirs — vacuum's staging-reservation scan (r15 racing-writer
#               guard): same pure driver-side filesystem class
#   _detect_evolve_merge — the t31 drift sink's per-batch body, called
#               only from its foreachBatch apply (driver-side); split out
#               so the batch persist/unpersist wraps it in try/finally
#   _young    — gc's retention-age probe (calls _newest_mtime): pure
#               driver-side os.walk mtime dating, no Spark at all
DRIVER_SIDE_CALLBACKS = {
    "apply",
    "appender",
    "_touched",
    "_overlaps",
    "_retained_files",
    "_reserved_dirs",
    "_young",
    "_detect_evolve_merge",
}


def _module_opts_into_by_value(tree: ast.Module) -> bool:
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr == "register_pickle_by_value"
        ):
            return True
    return False


def test_worker_closures_never_reference_by_ref_module_functions():
    offenders = []
    for path in sorted(ROOT.rglob("*.py")):
        tree = ast.parse(path.read_text())
        if _module_opts_into_by_value(tree):
            continue
        mod_funcs = {
            n.name
            for n in tree.body
            if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
        }
        imported = {}
        for n in ast.walk(tree):
            if (
                isinstance(n, ast.ImportFrom)
                and n.module
                and n.module.startswith("ez_cdc_spark")
            ):
                for a in n.names:
                    imported[a.asname or a.name] = n.module

        class V(ast.NodeVisitor):
            def __init__(self):
                self.stack = []

            def visit_FunctionDef(self, node):
                self.stack.append(node.name)
                nested = len(self.stack) >= 2
                driver_side = bool(
                    set(self.stack) & DRIVER_SIDE_CALLBACKS
                )
                if nested and not driver_side:
                    for sub in ast.walk(node):
                        if (
                            isinstance(sub, ast.Name)
                            and isinstance(sub.ctx, ast.Load)
                            and (sub.id in mod_funcs or sub.id in imported)
                        ):
                            # local shadowing (comprehension targets, params,
                            # assignments) is not a module reference
                            if _locally_bound(node, sub.id):
                                continue
                            offenders.append(
                                f"{path.name}:{sub.lineno} "
                                f"{'->'.join(self.stack)} refs {sub.id}"
                            )
                self.generic_visit(node)
                self.stack.pop()

            visit_AsyncFunctionDef = visit_FunctionDef

            def visit_Lambda(self, node):
                # A lambda at stack depth >= 1 (inside any module function)
                # is a nested closure too — e.g. passed inline to
                # mapInPandas — and escapes the FunctionDef walk above, so
                # the exact regression class this audit exists to block
                # could land silently through it.
                nested = len(self.stack) >= 1
                driver_side = bool(set(self.stack) & DRIVER_SIDE_CALLBACKS)
                if nested and not driver_side:
                    for sub in ast.walk(node.body):
                        if (
                            isinstance(sub, ast.Name)
                            and isinstance(sub.ctx, ast.Load)
                            and (sub.id in mod_funcs or sub.id in imported)
                        ):
                            if _locally_bound(node, sub.id):
                                continue
                            offenders.append(
                                f"{path.name}:{sub.lineno} "
                                f"{'->'.join(self.stack)}-><lambda> refs {sub.id}"
                            )
                self.generic_visit(node)

        V().visit(tree)
    assert not offenders, (
        "worker closures reference module-level ez_cdc_spark functions "
        "without by-value registration (crashes external-driver executors):\n"
        + "\n".join(offenders)
    )


def _locally_bound(fn: ast.AST, name: str) -> bool:
    for sub in ast.walk(fn):
        if isinstance(sub, ast.Name) and isinstance(sub.ctx, ast.Store) and sub.id == name:
            return True
        if isinstance(sub, (ast.FunctionDef, ast.AsyncFunctionDef, ast.Lambda)):
            args = sub.args
            all_args = (
                args.posonlyargs + args.args + args.kwonlyargs
                + ([args.vararg] if args.vararg else [])
                + ([args.kwarg] if args.kwarg else [])
            )
            if any(a.arg == name for a in all_args):
                return True
        if isinstance(sub, ast.comprehension):
            for t in ast.walk(sub.target):
                if isinstance(t, ast.Name) and t.id == name:
                    return True
    return False


def test_bench_query_lists_resolve_in_registry():
    """Every name bench.py times must exist in the registry — a typo here
    would crash the driver's bench phase, which runs after the correctness
    gate and would waste the round's measurement."""
    import importlib

    from ez_cdc_spark.queries import load_all

    bench = importlib.import_module("bench")
    reg = load_all()
    missing = [n for n in bench.EXTRA_QUERIES if n not in reg]
    assert missing == [], f"bench EXTRA_QUERIES not in registry: {missing}"
    assert len(set(bench.EXTRA_QUERIES)) == len(bench.EXTRA_QUERIES), "duplicates"
