"""Doc-rot guard: every backticked symbol in docs/api.md must resolve
against the real package (docs/api.md claims "every public symbol verified
to resolve" — this makes that claim mechanical). Non-code spans (CLI lines,
shell text, quoted config values) are skipped by shape, not by allowlist,
so new API entries are checked automatically."""

import dataclasses
import inspect
import re

import pytest


def _namespaces():
    import field_interpolation_tpu as fi
    from field_interpolation_tpu import (batch, checkpoint, constraints,
                                         contour, debugging, df, diff,
                                         explicit, grid, multigrid, native,
                                         operators, parallel, sdf, solver,
                                         stencils, utils, visualize, weights)
    from field_interpolation_tpu import ops
    from field_interpolation_tpu.ops import pallas_stencil
    from field_interpolation_tpu.parallel import contour as pcontour
    from field_interpolation_tpu.parallel import sharded
    from field_interpolation_tpu.utils import observe
    return {
        "fi": fi, "field_interpolation_tpu": fi, "batch": batch,
        "checkpoint": checkpoint, "constraints": constraints,
        "contour": contour, "debugging": debugging, "df": df, "diff": diff,
        "explicit": explicit, "grid": grid, "multigrid": multigrid,
        "native": native, "operators": operators, "parallel": parallel,
        "sdf": sdf, "solver": solver, "stencils": stencils, "utils": utils,
        "visualize": visualize, "weights": weights,
        "ops": ops, "pallas_stencil": pallas_stencil, "sharded": sharded,
        "observe": observe, "parallel.contour": pcontour,
    }


def _known_names(spaces):
    names = set()
    for m in spaces.values():
        for n in dir(m):
            if n.startswith("_"):
                continue
            names.add(n)
            obj = getattr(m, n)
            if inspect.isclass(obj):
                names.update(a for a in dir(obj) if not a.startswith("_"))
                if dataclasses.is_dataclass(obj):
                    names.update(f.name for f in dataclasses.fields(obj))
            if callable(obj):
                try:
                    names.update(inspect.signature(obj).parameters)
                except (ValueError, TypeError):
                    pass
    return names


def _resolve_dotted(token, spaces):
    head, *rest = token.split(".")
    obj = spaces.get(token)
    if obj is not None:
        return True
    obj = spaces.get(head)
    if obj is None:
        return False
    for part in rest:
        # ops.pallas_stencil style: allow one submodule hop via spaces
        if not hasattr(obj, part):
            return False
        obj = getattr(obj, part)
    return True


def test_api_md_symbols_resolve():
    # external vocabulary the doc legitimately names (JAX collectives,
    # the reference's loguru macro) — not symbols of this package
    external = {"shard_map", "ppermute", "psum", "vmap", "pjit", "jit",
                "checkify", "CHECK_F"}
    text = open("docs/api.md").read()
    spaces = _namespaces()
    known = _known_names(spaces)
    failures = []
    for span in re.findall(r"`([^`]+)`", text):
        s = span.strip()
        # non-code spans by shape: shell/CLI text, quoted values, paths,
        # flags, env vars, ranges like model_0..model_3
        if (" " in s or s.startswith(("-", "--", "/", ".", '"'))
                or "=" in s or '"' in s or ".." in s or "^" in s
                or s.endswith((".md", ".py"))):
            continue
        # signature → callee:  fi.solve(problem, config)  →  fi.solve
        s = s.split("(")[0]
        # bracket alternation: solve_sparse_linear[_with_guess]
        variants = []
        m = re.fullmatch(r"([\w.]+)\[(\w+)\]", s)
        if m:
            variants = [m.group(1), m.group(1) + m.group(2)]
        else:
            variants = [s]
        for v in variants:
            if not re.fullmatch(r"[A-Za-z_][\w.]*", v):
                continue
            if v in external or v.startswith("jax."):
                continue
            ok = (_resolve_dotted(v, spaces) if "." in v
                  else (v in known or v in spaces))
            if not ok:
                failures.append(v)
    assert not failures, f"unresolvable api.md symbols: {sorted(set(failures))}"


def _fences(path):
    import ast
    text = open(path).read()
    out = []
    for block in re.findall(r"```(?:python)?\n(.*?)```", text, re.S):
        try:
            ast.parse(block)
        except SyntaxError:
            continue  # shell lines / pseudocode fences
        out.append(block)
    return out


@pytest.mark.slow
@pytest.mark.parametrize("path", ["README.md", "docs/migration.md"])
def test_doc_code_fences_execute(path):
    """The documented snippets must actually run (with the illustrative
    free variables — an oriented point cloud — provided)."""
    import numpy as np
    import jax.numpy as jnp
    import field_interpolation_tpu as fi

    rng = np.random.default_rng(0)
    theta = rng.uniform(0, 2 * np.pi, 200)
    nrm = np.stack([np.cos(theta), np.sin(theta)], 1).astype(np.float32)
    pts = (127.5 + 80.0 * nrm + 0.2 * rng.standard_normal((200, 2))
           ).astype(np.float32)
    ns = {"np": np, "jnp": jnp, "fi": fi,
          "points": jnp.asarray(pts), "normals": jnp.asarray(nrm),
          "pts": jnp.asarray(pts), "nrm": jnp.asarray(nrm),
          "grid": fi.Grid((256, 256)), "weights": fi.Weights(model_2=0.3)}
    fences = _fences(path)
    assert fences, f"no executable fences found in {path}"
    for block in fences:
        exec(compile(block, path, "exec"), ns)
    info = ns.get("info")
    if info is not None:
        assert bool(info.converged)


def test_readme_headline_matches_bench_record():
    """Numbers-provenance guard (VERDICT r4 weak #1/#2): the README's
    headline ms/field must match the LATEST BENCH_r*.json within rig noise
    (±12% covers the measured day-to-day ±10%). When a new bench record
    lands, this fails until the README table is refreshed — by design."""
    import glob
    import json
    import os
    root = os.path.join(os.path.dirname(__file__), "..")
    benches = sorted(glob.glob(os.path.join(root, "BENCH_r*.json")))
    assert benches, "no BENCH_r*.json records found"
    with open(benches[-1]) as f:
        rec = json.load(f)
    # Driver records either the bare metric line or a wrapper with 'parsed'.
    if "parsed" in rec:
        rec = rec["parsed"]
    bench_val = float(rec["value"])
    readme = open(os.path.join(root, "README.md")).read()
    m = re.search(r"TRUE 1e-6 residual \(headline\) \| \*\*([0-9.]+) "
                  r"ms/field", readme)
    assert m, "README headline row not found (format changed?)"
    readme_val = float(m.group(1))
    assert abs(readme_val - bench_val) <= 0.12 * bench_val, (
        f"README quotes {readme_val} ms/field but {os.path.basename(benches[-1])} "
        f"records {bench_val} — refresh the README numbers table")
