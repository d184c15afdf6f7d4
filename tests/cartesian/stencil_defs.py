"""Canonical stencil definitions shared across backend-parity tests.

Mirrors the reference's registry pattern
(reference: tests/cartesian_tests/integration_tests/multi_feature_tests/
stencil_definitions.py:55-473): each entry declares a definition function
and an input generator; tests compile it for every backend and compare
results against the numpy oracle.
"""

import numpy as np

from gt4py_tpu.cartesian import gtscript
from gt4py_tpu.cartesian.gtscript import (
    BACKWARD,
    FORWARD,
    PARALLEL,
    computation,
    horizontal,
    interval,
    region,
    I,
    J,
    K,
    sin,
    sqrt,
    exp,
    __INLINED,
)
from gt4py_tpu.utils import Registry

Field3D = gtscript.Field[np.float64]

REGISTRY = Registry()  # name -> (definition, make_inputs, externals)


def register(externals=None, domain=None, origin=None):
    def _reg(make):
        definition, make_inputs = make()
        REGISTRY[make.__name__] = dict(
            definition=definition,
            make_inputs=make_inputs,
            externals=externals or {},
            domain=domain,
            origin=origin,
        )
        return make

    return _reg


def rand(*shape, seed=0, lo=0.0, hi=1.0):
    rng = np.random.default_rng(seed)
    return lo + (hi - lo) * rng.random(shape)


@register(origin=(0, 0, 0))
def copy_stencil():
    def definition(field_a: Field3D, field_b: Field3D):
        with computation(PARALLEL), interval(...):
            field_b = field_a[0, 0, 0]

    def make_inputs():
        return dict(field_a=rand(8, 9, 10), field_b=np.zeros((8, 9, 10)))

    return definition, make_inputs


@register(origin=(1, 1, 0), domain=(14, 14, 6))
def laplacian():
    def definition(out_f: Field3D, in_f: Field3D):
        with computation(PARALLEL), interval(...):
            out_f = -4.0 * in_f[0, 0, 0] + (
                in_f[1, 0, 0] + in_f[-1, 0, 0] + in_f[0, 1, 0] + in_f[0, -1, 0]
            )

    def make_inputs():
        return dict(out_f=np.zeros((16, 16, 6)), in_f=rand(16, 16, 6, seed=1))

    return definition, make_inputs


@register(origin=(2, 2, 0), domain=(12, 12, 5))
def horizontal_diffusion():
    def definition(in_field: Field3D, out_field: Field3D, coeff: Field3D):
        with computation(PARALLEL), interval(...):
            lap_field = 4.0 * in_field[0, 0, 0] - (
                in_field[1, 0, 0] + in_field[-1, 0, 0]
                + in_field[0, 1, 0] + in_field[0, -1, 0]
            )
            res = lap_field[1, 0, 0] - lap_field[0, 0, 0]
            flx_field = 0 if (res * (in_field[1, 0, 0] - in_field[0, 0, 0])) > 0 else res
            res = lap_field[0, 1, 0] - lap_field[0, 0, 0]
            fly_field = 0 if (res * (in_field[0, 1, 0] - in_field[0, 0, 0])) > 0 else res
            out_field = in_field[0, 0, 0] - coeff[0, 0, 0] * (
                flx_field[0, 0, 0] - flx_field[-1, 0, 0]
                + fly_field[0, 0, 0] - fly_field[0, -1, 0]
            )

    def make_inputs():
        return dict(
            in_field=rand(16, 16, 5, seed=2),
            out_field=np.zeros((16, 16, 5)),
            coeff=rand(16, 16, 5, seed=3),
        )

    return definition, make_inputs


@register(origin=(0, 0, 0))
def tridiagonal_solver():
    def definition(inf: Field3D, diag: Field3D, sup: Field3D, rhs: Field3D, out: Field3D):
        with computation(FORWARD):
            with interval(0, 1):
                sup = sup / diag
                rhs = rhs / diag
            with interval(1, None):
                sup = sup / (diag - sup[0, 0, -1] * inf)
                rhs = (rhs - inf * rhs[0, 0, -1]) / (diag - sup[0, 0, -1] * inf)
        with computation(BACKWARD):
            with interval(-1, None):
                out = rhs
            with interval(0, -1):
                out = rhs - sup * out[0, 0, 1]

    def make_inputs():
        return dict(
            inf=rand(6, 7, 12, seed=3, hi=0.1),
            diag=rand(6, 7, 12, seed=4, lo=2.0, hi=3.0),
            sup=rand(6, 7, 12, seed=5, hi=0.1),
            rhs=rand(6, 7, 12, seed=6),
            out=np.zeros((6, 7, 12)),
        )

    return definition, make_inputs


@register(
    origin=(0, 0, 0),
    externals={"BET_M": 0.5, "BET_P": 0.5},
)
def vertical_advection_dycore():
    def definition(
        utens_stage: Field3D,
        u_stage: Field3D,
        wcon: Field3D,
        u_pos: Field3D,
        utens: Field3D,
        *,
        dtr_stage: float,
    ):
        from __externals__ import BET_M, BET_P

        with computation(FORWARD):
            with interval(0, 1):
                gcv = 0.25 * (wcon[1, 0, 1] + wcon[0, 0, 1])
                cs = gcv * BET_M

                ccol = gcv * BET_P
                bcol = dtr_stage - ccol[0, 0, 0]

                correction_term = -cs * (u_stage[0, 0, 1] - u_stage[0, 0, 0])
                dcol = (
                    dtr_stage * u_pos[0, 0, 0]
                    + utens[0, 0, 0]
                    + utens_stage[0, 0, 0]
                    + correction_term
                )

                divided = 1.0 / bcol[0, 0, 0]
                ccol = ccol[0, 0, 0] * divided
                dcol = dcol[0, 0, 0] * divided

            with interval(1, -1):
                gav = -0.25 * (wcon[1, 0, 0] + wcon[0, 0, 0])
                gcv = 0.25 * (wcon[1, 0, 1] + wcon[0, 0, 1])

                as_ = gav * BET_M
                cs = gcv * BET_M

                acol = gav * BET_P
                ccol = gcv * BET_P
                bcol = dtr_stage - acol[0, 0, 0] - ccol[0, 0, 0]

                correction_term = -as_ * (u_stage[0, 0, -1] - u_stage[0, 0, 0]) - cs * (
                    u_stage[0, 0, 1] - u_stage[0, 0, 0]
                )
                dcol = (
                    dtr_stage * u_pos[0, 0, 0]
                    + utens[0, 0, 0]
                    + utens_stage[0, 0, 0]
                    + correction_term
                )

                divided = 1.0 / (bcol[0, 0, 0] - ccol[0, 0, -1] * acol[0, 0, 0])
                ccol = ccol[0, 0, 0] * divided
                dcol = (dcol[0, 0, 0] - (dcol[0, 0, -1]) * acol[0, 0, 0]) * divided

            with interval(-1, None):
                gav = -0.25 * (wcon[1, 0, 0] + wcon[0, 0, 0])
                as_ = gav * BET_M
                acol = gav * BET_P
                bcol = dtr_stage - acol[0, 0, 0]

                correction_term = -as_ * (u_stage[0, 0, -1] - u_stage[0, 0, 0])
                dcol = (
                    dtr_stage * u_pos[0, 0, 0]
                    + utens[0, 0, 0]
                    + utens_stage[0, 0, 0]
                    + correction_term
                )

                divided = 1.0 / (bcol[0, 0, 0] - ccol[0, 0, -1] * acol[0, 0, 0])
                dcol = (dcol[0, 0, 0] - (dcol[0, 0, -1]) * acol[0, 0, 0]) * divided

        with computation(BACKWARD):
            with interval(-1, None):
                datacol = dcol[0, 0, 0]
                utens_stage = dtr_stage * (datacol - u_pos[0, 0, 0])

            with interval(0, -1):
                datacol = dcol[0, 0, 0] - ccol[0, 0, 0] * datacol[0, 0, 1]
                utens_stage = dtr_stage * (datacol - u_pos[0, 0, 0])

    ni, nj, nk = 8, 9, 10

    def make_inputs():
        return dict(
            utens_stage=rand(ni, nj, nk, seed=10),
            u_stage=rand(ni, nj, nk, seed=11),
            wcon=rand(ni + 1, nj, nk + 1, seed=12, hi=0.2),
            u_pos=rand(ni, nj, nk, seed=13),
            utens=rand(ni, nj, nk, seed=14),
            dtr_stage=3.0,
        )

    return definition, make_inputs


@register(origin=(0, 0, 0))
def runtime_if_nested():
    def definition(in_f: Field3D, out_f: Field3D):
        with computation(PARALLEL), interval(...):
            if in_f > 0.5:
                tmp = in_f * 2.0
                if tmp > 1.5:
                    out_f = tmp
                else:
                    out_f = -tmp
            else:
                out_f = 0.0

    def make_inputs():
        return dict(in_f=rand(7, 7, 7, seed=20), out_f=np.zeros((7, 7, 7)))

    return definition, make_inputs


@register(origin=(0, 0, 0))
def while_halving():
    def definition(field_a: Field3D):
        with computation(PARALLEL), interval(...):
            while field_a > 1.0:
                field_a = field_a / 2.0

    def make_inputs():
        return dict(field_a=rand(5, 5, 5, seed=21, hi=10.0))

    return definition, make_inputs


@register(origin=(0, 0, 0))
def k_intervals():
    def definition(in_field: Field3D, out_field: Field3D):
        with computation(PARALLEL):
            with interval(0, 6):
                out_field = in_field
            with interval(6, -10):
                out_field = in_field + 1
            with interval(-10, None):
                out_field = in_field

    def make_inputs():
        return dict(in_field=rand(4, 4, 20, seed=22), out_field=np.zeros((4, 4, 20)))

    return definition, make_inputs


@register(origin=(0, 0, 0))
def horizontal_regions():
    def definition(field_in: Field3D, field_out: Field3D):
        with computation(PARALLEL), interval(...):
            field_out = field_in
            with horizontal(
                region[I[0] : I[0] + 2, J[0] : J[0] + 2],
                region[I[-1] - 2 : I[-1], J[-1] - 2 : J[-1]],
            ):
                field_out = field_in + 1.0

    def make_inputs():
        return dict(field_in=rand(9, 9, 3, seed=23), field_out=np.zeros((9, 9, 3)))

    return definition, make_inputs


@register(origin=(0, 0, 0))
def native_function_chain():
    def definition(field_a: Field3D, field_b: Field3D):
        with computation(PARALLEL), interval(...):
            field_b = sqrt(abs(sin(field_a) * 2.0) + exp(-abs(field_a))) + min(
                field_a, 0.5
            ) + max(field_a, 0.7)

    def make_inputs():
        return dict(field_a=rand(6, 6, 6, seed=24), field_b=np.zeros((6, 6, 6)))

    return definition, make_inputs


@register(origin=(0, 0, 0))
def forward_cumsum():
    def definition(inp: Field3D, out: Field3D):
        with computation(FORWARD):
            with interval(0, 1):
                out = inp
            with interval(1, None):
                out = out[0, 0, -1] + inp

    def make_inputs():
        return dict(inp=rand(3, 4, 9, seed=25), out=np.zeros((3, 4, 9)))

    return definition, make_inputs


@register(origin=(0, 0, 0))
def variable_k_offset():
    def definition(inp: Field3D, idx: gtscript.Field[np.int64], out: Field3D):
        with computation(PARALLEL), interval(...):
            out = inp[0, 0, idx]

    def make_inputs():
        rng = np.random.default_rng(26)
        return dict(
            inp=rand(4, 4, 8, seed=26),
            idx=rng.integers(-3, 4, size=(4, 4, 8)).astype(np.int64),
            out=np.zeros((4, 4, 8)),
        )

    return definition, make_inputs


@register(origin=(0, 0, 0))
def data_dims_norm():
    def definition(vec: gtscript.Field[(np.float64, (3,))], out: Field3D):
        with computation(PARALLEL), interval(...):
            out = sqrt(
                vec[0, 0, 0][0] ** 2 + vec[0, 0, 0][1] ** 2 + vec[0, 0, 0][2] ** 2
            )

    def make_inputs():
        return dict(vec=rand(4, 4, 4, 3, seed=27), out=np.zeros((4, 4, 4)))

    return definition, make_inputs


@register(origin=(0, 0, 0))
def data_dims_dynamic_index():
    def definition(
        vec: gtscript.Field[(np.float64, (3,))],
        idx: gtscript.Field[np.int64],
        out: Field3D,
    ):
        with computation(PARALLEL), interval(...):
            out = vec[0, 0, 0][idx % 3] + vec[0, 0, 0][1]

    def make_inputs():
        rng = np.random.default_rng(41)
        return dict(
            vec=rand(4, 4, 4, 3, seed=41),
            idx=rng.integers(-6, 7, size=(4, 4, 4)).astype(np.int64),
            out=np.zeros((4, 4, 4)),
        )

    return definition, make_inputs


@register(origin=(0, 0, 0), externals={"FACTOR": 2.5, "USE_IT": True})
def externals_inlined():
    def definition(inp: Field3D, out: Field3D):
        from __externals__ import FACTOR, USE_IT

        with computation(PARALLEL), interval(...):
            if __INLINED(USE_IT):
                out = inp * FACTOR
            else:
                out = inp

    def make_inputs():
        return dict(inp=rand(4, 4, 4, seed=28), out=np.zeros((4, 4, 4)))

    return definition, make_inputs


@register(origin=(0, 1, 0), domain=(8, 6, 3))
def gtscript_function_offsets():
    @gtscript.function
    def avg_j(b):
        return 0.5 * (b[0, 1, 0] + b[0, -1, 0])

    def definition(inp: Field3D, out: Field3D):
        with computation(PARALLEL), interval(...):
            out = avg_j(inp)

    def make_inputs():
        return dict(inp=rand(8, 8, 3, seed=29), out=np.zeros((8, 8, 3)))

    return definition, make_inputs


@register(origin=(0, 0, 0))
def lower_dim_fields():
    Field2D = gtscript.Field[gtscript.IJ, np.float64]

    def definition(field_a: Field3D, field_b: Field2D, *, scalar_in: float):
        with computation(PARALLEL), interval(...):
            tmp = field_a * scalar_in
        with computation(FORWARD), interval(0, 1):
            field_b += tmp

    def make_inputs():
        return dict(
            field_a=rand(5, 6, 7, seed=30),
            field_b=np.zeros((5, 6)),
            scalar_in=2.0,
        )

    return definition, make_inputs


@register(origin={"_all_": (0, 0, 0), "extm": (0, 0, 1)}, domain=(5, 5, 6))
def set_inner_as_kord():
    """Bool fields, elif chains, read-only K offsets in PARALLEL
    (reference: stencil_definitions.py set_inner_as_kord)."""

    def definition(
        a4_1: Field3D, a4_2: Field3D, a4_3: Field3D,
        extm: gtscript.Field[np.bool_],
    ):
        with computation(PARALLEL), interval(...):
            diff_23 = 0.0
            if extm and extm[0, 0, -1]:
                a4_2 = a4_1
            elif extm and extm[0, 0, 1]:
                a4_3 = a4_1
            else:
                diff_23 = a4_2 - a4_3

    def make_inputs():
        rng = np.random.default_rng(40)
        return dict(
            a4_1=rand(5, 5, 6, seed=41),
            a4_2=rand(5, 5, 6, seed=42),
            a4_3=rand(5, 5, 6, seed=43),
            extm=rng.random((5, 5, 8)) > 0.5,  # K-halo 1 for the +-1 reads
        )

    return definition, make_inputs


@register(origin=(0, 0, 0))
def local_var_nested_conditional():
    def definition(in_storage: Field3D, out_storage: Field3D):
        with computation(PARALLEL), interval(0, 2):
            mid_storage = 2.0
            if in_storage[0, 0, 0] > 0:
                local_var = 4.0
                if local_var + in_storage < out_storage:
                    mid_storage = 3.0
                else:
                    mid_storage = 4.0
                out_storage[0, 0, 0] = local_var + mid_storage
        with computation(FORWARD), interval(2, None):
            if in_storage[0, 0, 0] < 0:
                local_var = 6.0
                out_storage[0, 0, 0] = local_var

    def make_inputs():
        return dict(
            in_storage=rand(5, 5, 6, seed=44, lo=-1.0, hi=1.0),
            out_storage=rand(5, 5, 6, seed=45, lo=0.0, hi=8.0),
        )

    return definition, make_inputs


@register(origin=(0, 0, 0))
def multibranch_param_conditional():
    def definition(in_field: Field3D, out_field: Field3D, c: float):
        with computation(PARALLEL), interval(...):
            if c > 0.0:
                out_field = in_field + in_field[1, 0, 0]
            elif c < -1.0:
                out_field = in_field - in_field[1, 0, 0]
            else:
                out_field = in_field

    def make_inputs():
        return dict(
            in_field=rand(6, 5, 4, seed=46),
            out_field=np.zeros((6, 5, 4)),
            c=-2.0,
        )

    return definition, make_inputs


@register(origin=(0, 0, 0), externals={"PHYS_TEND_A": False, "PHYS_TEND_B": True})
def two_optional_fields():
    def definition(
        in_a: Field3D, in_b: Field3D, out_a: Field3D, out_b: Field3D,
        dyn_tend_a: Field3D, dyn_tend_b: Field3D,
        phys_tend_a: Field3D = None, phys_tend_b: Field3D = None,
        *, dt: float,
    ):
        from __externals__ import PHYS_TEND_A, PHYS_TEND_B

        with computation(PARALLEL), interval(...):
            out_a = in_a + dt * dyn_tend_a
            out_b = in_b + dt * dyn_tend_b
            if __INLINED(PHYS_TEND_A):
                out_a = out_a + dt * phys_tend_a
            if __INLINED(PHYS_TEND_B):
                out_b = out_b + dt * phys_tend_b

    def make_inputs():
        shape = (4, 4, 4)
        return dict(
            in_a=rand(*shape, seed=47), in_b=rand(*shape, seed=48),
            out_a=np.zeros(shape), out_b=np.zeros(shape),
            dyn_tend_a=rand(*shape, seed=49), dyn_tend_b=rand(*shape, seed=50),
            phys_tend_a=None, phys_tend_b=rand(*shape, seed=51),
            dt=0.1,
        )

    return definition, make_inputs


@register(origin=(0, 0, 0))
def while_backward():
    def definition(field_a: Field3D, field_b: Field3D):
        with computation(BACKWARD), interval(...):
            while field_a > 2.0:
                field_b = -1.0
                field_a = -field_b + field_a / 2.0

    def make_inputs():
        return dict(
            field_a=rand(4, 4, 5, seed=52, hi=10.0),
            field_b=np.zeros((4, 4, 5)),
        )

    return definition, make_inputs


@register(origin=(0, 0, 0))
def region_with_conditional():
    def definition(field_in: Field3D, field_out: Field3D):
        with computation(PARALLEL), interval(...):
            field_out = 0.0
            with horizontal(
                region[I[0] : I[0] + 2, J[0] : J[0] + 2],
                region[I[-1] - 2 : I[-1], J[-1] - 2 : J[-1]],
            ):
                if field_in > 0.5:
                    field_out = field_in + 1.0
                else:
                    field_out = 0.0

    def make_inputs():
        return dict(field_in=rand(9, 9, 3, seed=53), field_out=np.zeros((9, 9, 3)))

    return definition, make_inputs


@register(origin=(0, 0, 0))
def native_functions_full():
    """The full 30-function math chain (reference: native_functions)."""

    @gtscript.function
    def a_gtscript_function(b):
        return sqrt(abs(b[0, 1, 0]))

    from gt4py_tpu.cartesian.gtscript import (  # noqa: F401
        acos, acosh, asin, asinh, atan, atanh, cbrt, ceil, cos, cosh,
        erf, erfc, floor, gamma, isfinite, isinf, isnan, log,
        log10, log2, mod, round_away_from_zero, sinh, tan, tanh, trunc,
    )

    def definition(field_a: Field3D, field_b: Field3D):
        with computation(PARALLEL), interval(...):
            abs_res = abs(field_a)
            max_res = max(abs_res, 1.0)
            min_res = min(max_res, 42.0)
            mod_res = mod(min_res, 37.5)
            sin_res = sin(mod_res)
            asin_res = asin(sin_res)
            cos_res = cos(asin_res)
            acos_res = acos(cos_res)
            tan_res = tan(acos_res)
            atan_res = atan(tan_res)
            sinh_res = sinh(atan_res)
            asinh_res = asinh(sinh_res)
            cosh_res = cosh(asinh_res)
            acosh_res = acosh(cosh_res)
            tanh_res = tanh(acosh_res)
            atanh_res = atanh(tanh_res)
            sqrt_res = a_gtscript_function(atanh_res)
            pow10_res = 10.0 ** sqrt_res
            log10_res = log10(pow10_res)
            log2_res = log2(2.0 ** log10_res)
            exp_res = exp(log2_res)
            log_res = log(exp_res)
            gamma_res = gamma(log_res)
            cbrt_res = cbrt(gamma_res)
            floor_res = floor(cbrt_res)
            ceil_res = ceil(floor_res)
            trunc_res = trunc(ceil_res)
            round_afz_res = round_away_from_zero(trunc_res)
            erf_res = erf(round_afz_res)
            erfc_res = erfc(erf_res)
            field_b = (
                trunc_res
                if isfinite(erfc_res)
                else field_a
                if isinf(erfc_res)
                else field_b
                if isnan(erfc_res)
                else 0.0
            )

    def make_inputs():
        return dict(
            field_a=rand(4, 5, 3, seed=54, lo=0.1, hi=0.9),
            field_b=np.zeros((4, 5, 3)),
        )

    return definition, make_inputs


# --------------------------------------------------------------------- #
# round 3 (VERDICT #8): the remaining reference canonical stencils
# (stencil_definitions.py:84-473) plus region/while/data-dims
# interaction cases
# --------------------------------------------------------------------- #


@register(origin=(0, 0, 0))
def arithmetic_ops():
    """Every binary operator incl. %, **, unary +/- in one expression."""

    def definition(field_a: Field3D, field_b: Field3D):
        with computation(PARALLEL), interval(...):
            field_a = (((field_b * +3.5 - 1.25) / -7.0 + 11.5) % 5.0) ** 2

    def make_inputs():
        return dict(field_a=np.zeros((5, 5, 4)), field_b=rand(5, 5, 4, seed=60))

    return definition, make_inputs


@register(origin=(0, 0, 0))
def scalar_inputs():
    def definition(field_a: Field3D, *, scalar_in: float):
        with computation(PARALLEL), interval(...):
            field_a = field_a * scalar_in

    def make_inputs():
        return dict(field_a=rand(5, 5, 4, seed=61), scalar_in=3.75)

    return definition, make_inputs


@register(origin=(0, 0, 0))
def unary_operation():
    """A write whose RHS is only a negated scalar parameter."""

    def definition(field_a: Field3D, *, scalar_in: float):
        with computation(PARALLEL), interval(...):
            field_a = -scalar_in

    def make_inputs():
        return dict(field_a=rand(5, 5, 4, seed=62), scalar_in=2.5)

    return definition, make_inputs


@register(origin=(0, 0, 0))
def data_types():
    """One field per supported dtype, each assigned a literal (reference
    data_types: dtype plumbing end to end incl. extreme integer values)."""

    def definition(
        bool_field: gtscript.Field[bool],
        npbool_field: gtscript.Field[np.bool_],
        int8_field: gtscript.Field[np.int8],
        int16_field: gtscript.Field[np.int16],
        int32_field: gtscript.Field[np.int32],
        int64_field: gtscript.Field[np.int64],
        float32_field: gtscript.Field[np.float32],
        float64_field: gtscript.Field[np.float64],
    ):
        with computation(PARALLEL), interval(...):
            bool_field = True
            npbool_field = False
            int8_field = 125
            int16_field = 32749
            int32_field = 2147483641
            int64_field = 9223372036854775783
            float32_field = 19.25
            float64_field = 19.25

    def make_inputs():
        shape = (4, 4, 3)
        return dict(
            bool_field=np.zeros(shape, bool),
            npbool_field=np.ones(shape, np.bool_),
            int8_field=np.zeros(shape, np.int8),
            int16_field=np.zeros(shape, np.int16),
            int32_field=np.zeros(shape, np.int32),
            int64_field=np.zeros(shape, np.int64),
            float32_field=np.zeros(shape, np.float32),
            float64_field=np.zeros(shape, np.float64),
        )

    return definition, make_inputs


@register(origin=(0, 0, 0))
def single_level_with_offset():
    """A PARALLEL computation restricted to one interior K level."""

    def definition(in_field: Field3D, out_field: Field3D):
        with computation(PARALLEL), interval(1, 2):
            out_field = in_field

    def make_inputs():
        return dict(in_field=rand(5, 5, 6, seed=63), out_field=np.zeros((5, 5, 6)))

    return definition, make_inputs


@register(origin=(0, 0, 0))
def form_land_mask():
    """Comparison result written into a bool field."""

    def definition(in_field: Field3D, mask: gtscript.Field[np.bool_]):
        with computation(PARALLEL), interval(...):
            mask = in_field >= 0.0

    def make_inputs():
        return dict(
            in_field=rand(5, 5, 4, seed=64, lo=-1.0, hi=1.0),
            mask=np.zeros((5, 5, 4), np.bool_),
        )

    return definition, make_inputs


@register(origin=(0, 0, 0), externals={"DO_SOMETHING": False})
def allow_empty_computation():
    """A computation whose body is entirely inlined away must be legal."""

    def definition(in_field: Field3D, out_field: Field3D):
        from __externals__ import DO_SOMETHING

        with computation(FORWARD), interval(...):
            out_field = in_field
        with computation(PARALLEL), interval(...):
            if __INLINED(DO_SOMETHING):
                out_field = abs(in_field)

    def make_inputs():
        return dict(
            in_field=rand(5, 5, 4, seed=65, lo=-1.0, hi=1.0),
            out_field=np.zeros((5, 5, 4)),
        )

    return definition, make_inputs


def _optional_field_definition():
    def definition(
        in_field: Field3D,
        out_field: Field3D,
        dyn_tend: Field3D,
        phys_tend: Field3D = None,
        *,
        dt: float,
    ):
        from __externals__ import PHYS_TEND

        with computation(PARALLEL), interval(...):
            out_field = in_field + dt * dyn_tend
            if __INLINED(PHYS_TEND):
                out_field = out_field + dt * phys_tend

    return definition


@register(origin=(0, 0, 0), externals={"PHYS_TEND": False})
def unused_optional_field():
    def make_inputs():
        shape = (4, 4, 4)
        return dict(
            in_field=rand(*shape, seed=66), out_field=np.zeros(shape),
            dyn_tend=rand(*shape, seed=67), phys_tend=None, dt=0.25,
        )

    return _optional_field_definition(), make_inputs


@register(origin=(0, 0, 0), externals={"PHYS_TEND": True})
def required_optional_field():
    def make_inputs():
        shape = (4, 4, 4)
        return dict(
            in_field=rand(*shape, seed=68), out_field=np.zeros(shape),
            dyn_tend=rand(*shape, seed=69), phys_tend=rand(*shape, seed=70),
            dt=0.25,
        )

    return _optional_field_definition(), make_inputs


@register(origin=(1, 1, 0), domain=(6, 6, 4))
def region_while_interaction():
    """A while loop nested inside a horizontal region: iteration count
    varies per point and the region restricts which points iterate."""

    def definition(field_a: Field3D, field_b: Field3D):
        with computation(PARALLEL), interval(...):
            field_b = field_a
            with horizontal(region[I[0] : I[2], :]):
                while field_b < 4.0:
                    field_b = field_b * 2.0 + 0.125

    def make_inputs():
        return dict(
            field_a=rand(8, 8, 4, seed=71, lo=0.1, hi=1.0),
            field_b=np.zeros((8, 8, 4)),
        )

    return definition, make_inputs


@register(origin=(1, 1, 0), domain=(6, 6, 4))
def region_data_dims_interaction():
    """Data-dimension indexing inside a horizontal region with an offset
    read, mixing the two features the reference tests separately."""

    def definition(
        vec: gtscript.Field[(np.float64, (3,))], out: Field3D
    ):
        with computation(PARALLEL), interval(...):
            out = vec[0, 0, 0][0]
            with horizontal(region[:, J[0] : J[3]]):
                out = vec[1, 0, 0][1] + vec[0, 0, 0][2]

    def make_inputs():
        return dict(vec=rand(8, 8, 4, 3, seed=72), out=np.zeros((8, 8, 4)))

    return definition, make_inputs


@register(origin=(0, 0, 0))
def while_data_dims_interaction():
    """A while loop whose body reads a data-dimension field component."""

    def definition(
        vec: gtscript.Field[(np.float64, (2,))], out: Field3D
    ):
        with computation(FORWARD), interval(...):
            out = 0.0
            while out < vec[0, 0, 0][0]:
                out = out + vec[0, 0, 0][1]

    def make_inputs():
        return dict(
            vec=rand(5, 5, 4, 2, seed=73, lo=0.2, hi=1.0),
            out=np.zeros((5, 5, 4)),
        )

    return definition, make_inputs
