"""utils/expr.py — the Custom*Force energy-expression compiler.

The reference rides OpenMM's Lepton for these (SURVEY section 2; the
workflow entry example/nacl_tg.py:37-42 loads XML decks with arbitrary
Custom*Force algebra); this pins our jax-traceable equivalent against
closed-form values, including the TPU-specific integer-power pitfall.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openmm_drudenose_tpu.utils.expr import (ExpressionError,
                                             compile_expression,
                                             expression_names)


def ev(text, **env):
    fn = compile_expression(text, list(env))
    return np.asarray(fn(env), np.float64)


def test_arithmetic_and_precedence():
    assert ev("1+2*3") == 7.0
    assert ev("(1+2)*3") == 9.0
    assert ev("2^3^2") == 512.0          # right-associative
    assert ev("-2^2") == -4.0            # unary minus binds looser than ^
    assert ev("6/3/2") == 1.0            # left-associative
    assert ev("2^-2") == 0.25
    assert np.isclose(ev("1.5e2 + .5"), 150.5)


def test_integer_power_negative_base():
    # jnp.power(x, 2.0) is exp(2 log x) -> NaN for x < 0; the compiler
    # must lower constant integer exponents to lax.integer_pow
    v = ev("(r-r0)^2", r=0.09, r0=0.1)
    assert np.isfinite(v) and np.isclose(v, 1e-4)
    v = ev("(r-r0)^3", r=0.0, r0=1.0)
    assert np.isclose(v, -1.0)
    v = ev("x^-2", x=-2.0)
    assert np.isclose(v, 0.25)


def test_functions():
    assert np.isclose(ev("sqrt(x)", x=4.0), 2.0)
    assert np.isclose(ev("exp(log(x))", x=3.0), 3.0)
    assert np.isclose(ev("sin(x)^2+cos(x)^2", x=0.7), 1.0)
    assert np.isclose(ev("atan2(y, x)", y=1.0, x=1.0), math.pi / 4)
    assert np.isclose(ev("min(a, b) + max(a, b)", a=2.0, b=5.0), 7.0)
    assert np.isclose(ev("abs(-x)", x=3.0), 3.0)
    assert np.isclose(ev("erfc(x) + erf(x)", x=0.3), 1.0)
    assert np.isclose(ev("sec(x)*cos(x)", x=0.4), 1.0)
    assert np.isclose(ev("recip(cube(x))", x=2.0), 0.125)


def test_step_delta_select():
    assert ev("step(x)", x=-1.0) == 0.0
    assert ev("step(x)", x=0.0) == 1.0   # OpenMM: step(0) = 1
    assert ev("step(x)", x=2.0) == 1.0
    assert ev("delta(x)", x=0.0) == 1.0
    assert ev("delta(x)", x=1e-8) == 0.0
    assert ev("select(c, a, b)", c=0.0, a=5.0, b=7.0) == 7.0
    assert ev("select(c, a, b)", c=2.0, a=5.0, b=7.0) == 5.0


def test_intermediate_definitions_right_to_left():
    # later definitions are visible to earlier ones (OpenMM semantics)
    v = ev("a+b; a=2*c; b=c+1; c=x", x=3.0)
    assert v == 6 + 4
    # a definition may not use a name only defined to its LEFT
    with pytest.raises(ExpressionError):
        compile_expression("a; b=x; a=b+q; q=x", ["x"])


def test_lj_expression_matches_closed_form():
    text = ("4*epsilon*(s6^2 - s6); s6=(sigma/r)^6")
    fn = compile_expression(text, ["epsilon", "sigma", "r"])
    r = jnp.asarray([0.3, 0.34, 0.5])
    out = np.asarray(fn({"epsilon": 0.65, "sigma": 0.34, "r": r}))
    s6 = (0.34 / np.asarray(r)) ** 6
    np.testing.assert_allclose(out, 4 * 0.65 * (s6 * s6 - s6), rtol=1e-12)


def test_autodiff_through_expression():
    fn = compile_expression("0.5*k*(r-r0)^2", ["k", "r0", "r"])
    g = jax.grad(lambda r: fn({"k": 2.0, "r0": 1.0, "r": r}))(1.3)
    assert np.isclose(float(g), 2.0 * 0.3)


def test_errors():
    with pytest.raises(ExpressionError):
        compile_expression("x + y", ["x"])          # unknown name
    with pytest.raises(ExpressionError):
        compile_expression("x +", ["x"])            # dangling operator
    with pytest.raises(ExpressionError):
        compile_expression("foo(x)", ["x"])         # unknown function
    with pytest.raises(ExpressionError):
        compile_expression("sqrt(x, y)", ["x", "y"])  # arity
    with pytest.raises(ExpressionError):
        compile_expression("x $ y", ["x", "y"])     # bad character
    with pytest.raises(ExpressionError):
        compile_expression("", ["x"])


def test_expression_names():
    assert expression_names("4*eps*(s^2-s); s=(sig/r)^6") == \
        {"eps", "sig", "r"}
    assert expression_names("k*(theta-theta0)^2") == {"k", "theta",
                                                      "theta0"}


def test_extra_fns_registration():
    # caller-registered functions (CustomExternalForce's periodicdistance
    # pattern): validated at compile time, bound as env callables at eval
    fn = compile_expression("dist(x, y)^2", ["x", "y"],
                            extra_fns={"dist": 2})
    out = fn({"x": 3.0, "y": 7.0, "dist": lambda a, b: b - a})
    assert float(out) == 16.0
    with pytest.raises(ExpressionError):          # wrong arity
        compile_expression("dist(x)", ["x"], extra_fns={"dist": 2})
    with pytest.raises(ExpressionError):          # still unknown elsewhere
        compile_expression("dist(x, y)", ["x", "y"])


def test_expression_functions():
    from openmm_drudenose_tpu.utils.expr import expression_functions
    assert expression_functions(
        "0.5*k*periodicdistance(x, y, z, x0, y0, z0)^2") == \
        {"periodicdistance"}
    assert expression_functions("a*b; b=sqrt(abs(a))") == {"sqrt", "abs"}
    assert expression_functions("k*x^2") == set()
