"""Examples as tests (ref examples/example_test.go): every runnable demo
program in examples/ must execute end to end (their internal asserts are
the oracles). Runs on the CPU mesh via conftest."""

import importlib.util
import pathlib
import sys

import pytest

pytestmark = pytest.mark.slow  # compile-heavy tier (see pyproject)

EXAMPLES = pathlib.Path(__file__).resolve().parent.parent / "examples"


def _run(name: str, **kwargs):
    spec = importlib.util.spec_from_file_location(name, EXAMPLES / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    mod.main(**kwargs)


def test_ckks_tutorial():
    _run("ckks_tutorial")


def test_ckks_sigmoid():
    _run("ckks_sigmoid")


def test_ckks_sigmoid_minimax():
    _run("ckks_sigmoid_minimax")


def test_bgv_vectorized_ole():
    _run("bgv_vectorized_ole")


def test_bgv_ride_hailing():
    _run("bgv_ride_hailing", n_drivers=8)


def test_ckks_scheme_switching():
    _run("ckks_scheme_switching")


def test_rgsw_blind_rotations():
    _run("rgsw_blind_rotations")


def test_multiparty_psi():
    _run("multiparty_psi")


def test_thresh_eval_key_gen():
    _run("thresh_eval_key_gen", n_parties=3, t=2)


def test_int_pir():
    _run("int_pir", n_parties=2)


def test_ckks_bootstrapping():
    _run("ckks_bootstrapping")


def test_ckks_vectorized_polynomial_evaluation():
    _run("ckks_vectorized_polynomial_evaluation")


def test_ckks_bootstrapping_high_precision():
    _run("ckks_bootstrapping_high_precision")


def test_template_ckks():
    _run("template_ckks")


def test_template_bgv():
    _run("template_bgv")


def test_ckks_bootstrapping_slim():
    _run("ckks_bootstrapping_slim")
