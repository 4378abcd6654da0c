"""Energy-expression compiler for Custom*Force classes.

The reference workflow leans on OpenMM's Lepton parser for the energy
expressions in CustomBondForce / CustomAngleForce / CustomTorsionForce /
CustomNonbondedForce decks (reference example/nacl_tg.py:37-42 loads force
fields whose Custom*Force tags carry arbitrary algebra).  This module is
the TPU-native equivalent: it parses the same expression grammar and
compiles it to a jax-traceable function, so forces come out of autodiff
and the whole term fuses into the jitted step.

Grammar (Lepton-compatible subset):

  expression := segment (';' name '=' segment)*
  segment    := sum
  sum        := product (('+'|'-') product)*
  product    := unary (('*'|'/') unary)*
  unary      := ('+'|'-') unary | power
  power      := atom ('^' unary)?          (right-associative)
  atom       := number | name | name '(' args ')' | '(' segment ')'

Intermediate definitions after ';' are evaluated right-to-left (later
definitions are visible to earlier ones), matching OpenMM semantics.

Functions: sqrt exp log sin cos sec csc tan cot asin acos atan atan2
sinh cosh tanh erf erfc step delta select min max abs floor ceil
square cube recip.

TPU/jax correctness notes baked in:
  * `x^k` with a constant integer k lowers to `lax.integer_pow` —
    `jnp.power(x, 2.0)` is exp(2 log x) and returns NaN for x < 0, which
    silently poisons e.g. (r - r0)^2 whenever r < r0.
  * step/delta/select/abs/floor/ceil have zero-measure kinks; autodiff
    through them is correct almost everywhere but, per the PME knot-
    gradient lesson (forces/pme.py custom JVP), force tests for
    expressions using them should probe the kink inputs explicitly.
"""

from __future__ import annotations

import re
from typing import Callable, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

__all__ = ["parse", "compile_expression", "expression_names",
           "expression_functions", "ExpressionError"]


class ExpressionError(ValueError):
    pass


_TOKEN = re.compile(r"""
    (?P<num>(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?)
  | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op>[-+*/^(),])
""", re.VERBOSE)


def _tokenize(s: str) -> List[Tuple[str, str]]:
    out, i = [], 0
    while i < len(s):
        if s[i].isspace():
            i += 1
            continue
        m = _TOKEN.match(s, i)
        if not m:
            raise ExpressionError(f"unexpected character {s[i]!r} in "
                                  f"expression {s!r}")
        out.append((m.lastgroup, m.group()))
        i = m.end()
    out.append(("end", ""))
    return out


class _Parser:
    def __init__(self, text: str):
        self.toks = _tokenize(text)
        self.pos = 0
        self.text = text

    def peek(self):
        return self.toks[self.pos]

    def next(self):
        t = self.toks[self.pos]
        self.pos += 1
        return t

    def expect(self, val):
        k, v = self.next()
        if v != val:
            raise ExpressionError(f"expected {val!r}, found {v!r} in "
                                  f"{self.text!r}")

    def parse(self):
        node = self.sum()
        k, v = self.peek()
        if k != "end":
            raise ExpressionError(f"trailing tokens from {v!r} in "
                                  f"{self.text!r}")
        return node

    def sum(self):
        node = self.product()
        while self.peek()[1] in ("+", "-"):
            op = self.next()[1]
            node = ("bin", op, node, self.product())
        return node

    def product(self):
        node = self.unary()
        while self.peek()[1] in ("*", "/"):
            op = self.next()[1]
            node = ("bin", op, node, self.unary())
        return node

    def unary(self):
        if self.peek()[1] == "-":
            self.next()
            return ("neg", self.unary())
        if self.peek()[1] == "+":
            self.next()
            return self.unary()
        return self.power()

    def power(self):
        node = self.atom()
        if self.peek()[1] == "^":
            self.next()
            # right-associative; exponent binds unary minus: x^-2
            node = ("bin", "^", node, self.unary())
        return node

    def atom(self):
        kind, val = self.next()
        if kind == "num":
            return ("num", float(val))
        if kind == "name":
            if self.peek()[1] == "(":
                self.next()
                args = [self.sum()]
                while self.peek()[1] == ",":
                    self.next()
                    args.append(self.sum())
                self.expect(")")
                return ("call", val, args)
            return ("var", val)
        if val == "(":
            node = self.sum()
            self.expect(")")
            return node
        raise ExpressionError(f"unexpected token {val!r} in {self.text!r}")


def parse(text: str):
    """Parse a single expression segment (no ';' definitions) to an AST."""
    return _Parser(text).parse()


_F = {
    "sqrt": jnp.sqrt, "exp": jnp.exp, "log": jnp.log,
    "sin": jnp.sin, "cos": jnp.cos, "tan": jnp.tan,
    "asin": jnp.arcsin, "acos": jnp.arccos, "atan": jnp.arctan,
    "sinh": jnp.sinh, "cosh": jnp.cosh, "tanh": jnp.tanh,
    "erf": jax.scipy.special.erf, "erfc": jax.scipy.special.erfc,
    "floor": jnp.floor, "ceil": jnp.ceil, "abs": jnp.abs,
    "square": lambda x: x * x, "cube": lambda x: x * x * x,
    "recip": lambda x: 1.0 / x,
    "sec": lambda x: 1.0 / jnp.cos(x), "csc": lambda x: 1.0 / jnp.sin(x),
    "cot": lambda x: 1.0 / jnp.tan(x),
}
_F2 = {"atan2": jnp.arctan2, "min": jnp.minimum, "max": jnp.maximum}


def _eval(node, env, text):
    kind = node[0]
    if kind == "num":
        return node[1]
    if kind == "var":
        name = node[1]
        if name not in env:
            raise ExpressionError(
                f"unknown variable {name!r} in {text!r} (available: "
                f"{sorted(env)})")
        return env[name]
    if kind == "neg":
        return -_eval(node[1], env, text)
    if kind == "bin":
        op, a, b = node[1], node[2], node[3]
        if op == "^":
            base = _eval(a, env, text)
            # constant integer exponents must NOT go through pow():
            # jnp.power(x, 2.0) is exp(2 log x) -> NaN for x < 0
            if b[0] == "num" and float(b[1]).is_integer():
                return jax.lax.integer_pow(jnp.asarray(base), int(b[1]))
            if b[0] == "neg" and b[1][0] == "num" \
                    and float(b[1][1]).is_integer():
                return jax.lax.integer_pow(jnp.asarray(base), -int(b[1][1]))
            return jnp.power(base, _eval(b, env, text))
        av, bv = _eval(a, env, text), _eval(b, env, text)
        if op == "+":
            return av + bv
        if op == "-":
            return av - bv
        if op == "*":
            return av * bv
        return av / bv
    # call
    fname, args = node[1], node[2]
    vals = [_eval(a, env, text) for a in args]
    if fname in _F:
        if len(vals) != 1:
            raise ExpressionError(f"{fname}() takes 1 argument in {text!r}")
        return _F[fname](vals[0])
    if fname in _F2:
        if len(vals) != 2:
            raise ExpressionError(f"{fname}() takes 2 arguments in {text!r}")
        return _F2[fname](vals[0], vals[1])
    if fname == "step":
        if len(vals) != 1:
            raise ExpressionError(f"step() takes 1 argument in {text!r}")
        x = jnp.asarray(vals[0])
        return jnp.where(x < 0, 0.0, 1.0).astype(x.dtype)
    if fname == "delta":
        if len(vals) != 1:
            raise ExpressionError(f"delta() takes 1 argument in {text!r}")
        x = jnp.asarray(vals[0])
        return jnp.where(x == 0, 1.0, 0.0).astype(x.dtype)
    if fname == "select":
        if len(vals) != 3:
            raise ExpressionError(f"select() takes 3 arguments in {text!r}")
        return jnp.where(jnp.asarray(vals[0]) == 0, vals[2], vals[1])
    # caller-registered functions (e.g. CustomExternalForce's
    # periodicdistance, which closes over the current box): bound as
    # callables in the evaluation env, validated by _check_calls via the
    # extra_fns arity table passed to compile_expression
    if fname in env and callable(env[fname]):
        return env[fname](*vals)
    raise ExpressionError(f"unknown function {fname!r} in {text!r}")


def _segments(text: str):
    """Split 'expr; name=expr; ...' into (main, [(name, ast), ...])."""
    parts = [p for p in text.split(";") if p.strip()]
    if not parts:
        raise ExpressionError("empty energy expression")
    main = parse(parts[0])
    defs = []
    for p in parts[1:]:
        if "=" not in p:
            raise ExpressionError(
                f"definition {p.strip()!r} lacks '=' in {text!r}")
        name, body = p.split("=", 1)
        name = name.strip()
        if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name):
            raise ExpressionError(f"bad intermediate name {name!r}")
        defs.append((name, parse(body)))
    return main, defs


def _free_names(node, out):
    if node[0] == "var":
        out.add(node[1])
    elif node[0] == "neg":
        _free_names(node[1], out)
    elif node[0] == "bin":
        _free_names(node[2], out)
        _free_names(node[3], out)
    elif node[0] == "call":
        for a in node[2]:
            _free_names(a, out)


_ARITY = dict({f: 1 for f in _F}, **{f: 2 for f in _F2},
              step=1, delta=1, select=3)


def _check_calls(node, text, extra_arity=None):
    arity = dict(_ARITY, **(extra_arity or {}))
    if node[0] == "neg":
        _check_calls(node[1], text, extra_arity)
    elif node[0] == "bin":
        _check_calls(node[2], text, extra_arity)
        _check_calls(node[3], text, extra_arity)
    elif node[0] == "call":
        fname, args = node[1], node[2]
        if fname not in arity:
            raise ExpressionError(f"unknown function {fname!r} in {text!r}")
        if len(args) != arity[fname]:
            raise ExpressionError(
                f"{fname}() takes {arity[fname]} argument(s), got "
                f"{len(args)} in {text!r}")
        for a in args:
            _check_calls(a, text, extra_arity)


def expression_names(text: str) -> set:
    """Free variable names of a full expression (main + definitions,
    with defined intermediates removed)."""
    main, defs = _segments(text)
    free: set = set()
    _free_names(main, free)
    for _, ast in defs:
        _free_names(ast, free)
    return free - {name for name, _ in defs}


def _call_names(node, out):
    if node[0] == "neg":
        _call_names(node[1], out)
    elif node[0] == "bin":
        _call_names(node[2], out)
        _call_names(node[3], out)
    elif node[0] == "call":
        out.add(node[1])
        for a in node[2]:
            _call_names(a, out)


def expression_functions(text: str) -> set:
    """Function names called anywhere in a full expression (used e.g. to
    detect `periodicdistance` for usesPeriodicBoundaryConditions)."""
    main, defs = _segments(text)
    fns: set = set()
    _call_names(main, fns)
    for _, ast in defs:
        _call_names(ast, fns)
    return fns


def compile_expression(text: str, variables: Sequence[str],
                       extra_fns: Dict[str, int] | None = None
                       ) -> Callable[..., object]:
    """Compile an OpenMM-style energy expression to
    ``fn(env: Dict[str, value]) -> value``.

    `variables` is the full set of names the caller will supply (base
    variables like 'r'/'theta', per-term parameters, global parameters).
    Unknown names raise ExpressionError at compile time, not trace time.
    Intermediate ';' definitions are evaluated right-to-left (OpenMM
    semantics: later definitions are visible to earlier ones).

    `extra_fns` registers caller-supplied functions (name -> arity); the
    caller must bind each name to a callable in the evaluation env (e.g.
    CustomExternalForce binds ``periodicdistance`` to a closure over the
    current box).
    """
    main, defs = _segments(text)
    _check_calls(main, text, extra_fns)
    for _, ast in defs:
        _check_calls(ast, text, extra_fns)
    known = set(variables)
    # right-to-left: each definition may use everything to its right
    avail = set(known)
    for name, ast in reversed(defs):
        free = set()
        _free_names(ast, free)
        missing = free - avail
        if missing:
            raise ExpressionError(
                f"unknown name(s) {sorted(missing)} in definition of "
                f"{name!r} (expression {text!r})")
        avail.add(name)
    free = set()
    _free_names(main, free)
    missing = free - avail
    if missing:
        raise ExpressionError(
            f"unknown name(s) {sorted(missing)} in {text!r} "
            f"(available: {sorted(avail)})")

    def fn(env: Dict[str, object]):
        e = dict(env)
        for name, ast in reversed(defs):
            e[name] = _eval(ast, e, text)
        return _eval(main, e, text)

    return fn
