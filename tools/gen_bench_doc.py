"""Render the committed BENCH_DETAIL.json into docs/benchmarks.md.

Keeps the user-facing benchmark tables in lockstep with the measured
artifact (every number on the page comes from the last full on-chip
bench run — no hand-maintained figures to go stale).  Run after any
bench refresh:

    python tools/gen_bench_doc.py
"""
import json
import pathlib

ROOT = pathlib.Path(__file__).resolve().parent.parent
d = json.loads((ROOT / "BENCH_DETAIL.json").read_text())
det = d["detail"]
cfg = det["baseline_configs"]

GENERAL = [
    ("CG, 64³ Poisson (fused kernel)",
     cfg["cg_poisson"]["fused_64cubed"], "device_us_per_iter"),
    ("CG, 64³ Poisson, bf16 stencil storage",
     cfg["cg_poisson"].get("fused_64cubed_bf16_storage", {}),
     "device_us_per_iter"),
    ("CG, 128³ Poisson (fused kernel)",
     cfg["cg_poisson"].get("fused_128cubed", {}), "device_us_per_iter"),
    ("MINRES, 64³ Poisson (fused)",
     cfg["cg_poisson"].get("minres_fused_64cubed", {}),
     "device_us_per_iter"),
]

PAIRS = [
    ("GMRES(20), 48³ conv-diff, Jacobi M", "convdiff_gmres20",
     "convdiff_gmres20_fused"),
    ("BiCGSTAB, 48³ conv-diff, Jacobi M", "convdiff_bicgstab",
     "convdiff_bicgstab_fused"),
    ("LSQR, 4096×2048 reg. LS (dense) / 48³ LS (fused)", "lsqr_reg",
     "convdiff_lsqr_fused"),
    ("LSMR, 4096×2048 reg. LS (dense) / 48³ LS (fused)", "lsmr_reg",
     "convdiff_lsmr_fused"),
    ("TriCG saddle", "saddle_tricg", "saddle_tricg_fused"),
    ("TriMR saddle", "saddle_trimr", "saddle_trimr_fused"),
    ("GPMR saddle (mem 20 / 48)", "saddle_gpmr", "saddle_gpmr_fused"),
    ("Block-GMRES(32), p=4, shifted Poisson",
     "block_gmres_shifted_poisson", "block_gmres_fused"),
    ("CG-Lanczos-shift (3 shifts), 64³ Poisson",
     "cg_lanczos_shift_poisson", "cg_lanczos_shift_fused"),
]


def us(c):
    if not c:
        return "—"
    v = c.get("device_us_per_iter")
    return f"{v:.1f}" if v is not None else "—"


lines = [
    "# Measured benchmarks (auto-generated)",
    "",
    "Source of truth: `BENCH_DETAIL.json` — the last full on-chip bench",
    "run (TPU v5e, one chip, driver harness; S-solves-in-one-jit median",
    "differencing, so the ~28 ms tunnel dispatch cost is excluded from",
    "every figure).  Regenerate this page with",
    "`python tools/gen_bench_doc.py` after a bench refresh.",
    "",
    f"Run: elapsed {det['elapsed_s']:.0f} s, skipped stages: "
    f"{det['skipped_stages'] or 'none'}.",
    "",
    "## SpMV (Gnnz/s, one chip)",
    "",
    "| problem | rate |",
    "|---|---|",
]
for k, v in det["spmv_gnnz_per_s"].items():
    lines.append(f"| {k} | {v:.2f} |")
lines += [
    "",
    f"Headline: **{d['value']:.1f} {d['unit']}** "
    f"({d['vs_baseline']:.0f}× the single-socket scipy CSR baseline "
    "measured in the same run).",
    "",
    "## Solver device time (µs per iteration)",
    "",
    "| config | general core | fused kernel |",
    "|---|---|---|",
]
for label, gk, fk in PAIRS:
    lines.append(f"| {label} | {us(cfg.get(gk))} | {us(cfg.get(fk))} |")
lines += [
    "",
    "| SPD flagship | µs/iter |",
    "|---|---|",
]
for label, c, key in GENERAL:
    lines.append(f"| {label} | {us(c)} |")
b = cfg.get("batched_cg_256x256")
if b:
    lines += [
        "",
        "## Batched",
        "",
        f"256 SPD systems of n=256 in one program: "
        f"{b['us_per_system']:.1f} µs per system "
        f"({b['device_us_per_iter']:.2f} µs per batched iteration).",
    ]
dw = cfg.get("cg_poisson", {}).get("double_word_64cubed")
if dw:
    lines += [
        "",
        "## double_word precision",
        "",
        f"CG 64³ at rtol {dw['rtol']}: true f64 relative residual "
        f"{dw['true_relres_f64']:.1e} from f32 storage in "
        f"{dw['wallclock_s']*1e3:.0f} ms wall-clock "
        f"({dw['niter']} total inner iterations).",
    ]
lines.append("")
(ROOT / "docs" / "benchmarks.md").write_text("\n".join(lines))
print(f"wrote docs/benchmarks.md ({len(lines)} lines)")
