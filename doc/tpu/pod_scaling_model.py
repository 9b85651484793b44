"""Pod scaling model: count per-step collective bytes from the compiled
HLO of the sharded fused FSI step and predict Mcells/s/chip vs (mesh,
grid) (VERDICT r03 next #4; regenerated round 5 after the collective-bill
cuts of VERDICT r04 next #1).

Method: lower + compile the FULL fused rigid-FSI step over virtual CPU
meshes (the SPMD partitioning and the collective set are
backend-independent; only codegen differs), sum the operand bytes of
every all-to-all / collective-permute / all-reduce in the HLO, and model

    t_step(mesh, N) ~ t_compute + t_comm          (no-overlap LOWER bound)
    t_step(mesh, N) ~ max(t_compute, t_comm)      (ideal-overlap UPPER bound)
    t_compute = (N^3 / mesh.size) / R_anchor      (R_anchor = measured
                single-chip cell rate at the same per-chip load)
    t_comm    = per-chip collective bytes / BW_ici

The two predictions BRACKET a real pod run: the software-pipelined
transposes (fft.py overlap_chunks) give XLA's latency-hiding scheduler
real overlap freedom, so the truth should sit between them; a measurement
below the no-overlap bound indicates DCN hops or non-overlapping
transposes, above the ideal bound indicates a modeling error.

Per-kind grid scaling from the probe grid n to a production grid N
(round 5 - the round-4 model scaled EVERYTHING by (N/n)^3, overstating
the marker-bound terms ~5x at production sizes, its own admission):

    all-to-all / collective-permute : (N/n)^3  (field-volume payloads)
    all-reduce / all-gather         : (N/n)^2  (marker/window payloads -
        the sparse-IBM exchange is now a (3, n_markers) psum
        [parallel/windows.windowed_e2l_mm_sharded], and marker counts
        scale with the body SURFACE; scalar dt/CFL reductions are
        constant, so quadratic is still conservative)

Run:  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
          XLA_FLAGS=--xla_force_host_platform_device_count=8 \
          python doc/tpu/pod_scaling_model.py
(the PALLAS_AXON_POOL_IPS scrub stops the axon sitecustomize hook from
force-registering the single-chip TPU backend). Writes doc/tpu/SCALING.md.

Anchors (one v5e chip, measured round 4, fast-default config,
doc/probe_sharded_step_ablation.py steady-state protocol):
    256^3-class per-chip load: 447 Mcells/s (mesh-(1,1) sharded step)
    512^3-class per-chip load: 369 Mcells/s
v5e ICI: 1 port per axis pair, ~45 GB/s/direction usable per link
(public v5e spec: 400 Gbps x 4 links); DCN excluded.
"""

import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

DTYPE_BYTES = {"f32": 4, "f64": 8, "c64": 8, "c128": 16, "bf16": 2,
               "s32": 4, "u32": 4, "pred": 1, "s8": 1, "u8": 1}

_SHAPE_RE = re.compile(r"(f32|f64|c64|c128|bf16|s32|u32|pred|s8|u8)\[([\d,]*)\]")

#: grid-scaling exponent from probe to production, per collective kind
SCALE_EXP = {"all-to-all": 3, "collective-permute": 3,
             "all-reduce": 2, "all-gather": 2, "reduce-scatter": 3}


def collective_stats(hlo: str) -> tuple[dict, dict]:
    """(per-kind PER-CHIP bytes, per-kind launch counts) of the
    collectives in an HLO module text. Counts the RESULT shape only (what
    one chip receives per op) - for all-to-all and collective-permute that
    equals what it sends."""
    out = {k: 0 for k in SCALE_EXP}
    counts = {k: 0 for k in SCALE_EXP}
    for line in hlo.splitlines():
        s = line.strip()
        for kind in out:
            if re.search(rf"= \S+ {kind}", s) or re.search(
                rf"= \({'.*'}\) {kind}", s
            ):
                m = _SHAPE_RE.search(s.split("=", 1)[1])
                if m:
                    dt, dims = m.groups()
                    n = 1
                    for d in dims.split(","):
                        if d:
                            n *= int(d)
                    out[kind] += n * DTYPE_BYTES[dt]
                    counts[kind] += 1
                break
    return out, counts


def main():
    import jax

    from __graft_entry__ import _build_fsi_case
    from sopht_mpi_tpu.parallel import create_mesh

    n_dev = jax.local_device_count()
    meshes = [(2, 1), (4, 1), (2, 2), (4, 2), (8, 1)]
    meshes = [m for m in meshes if m[0] * m[1] <= n_dev]
    if not meshes:
        raise SystemExit(
            f"need >= 2 devices for a multi-chip HLO (have {n_dev}; "
            "run with the env recipe in the module docstring)"
        )
    grid_n = int(os.environ.get("SCALING_GRID", "32"))

    anchor_rate = {256: 447e6, 512: 369e6}
    bw_ici = 45e9  # bytes/s/direction per v5e ICI link (public spec)

    rows = []
    for mesh_shape in meshes:
        mesh = create_mesh(
            3, mesh_shape, devices=jax.devices()[: mesh_shape[0] * mesh_shape[1]]
        )
        arms = {}
        for arm, kw in (("f32", {}), ("bf16-wire", {"comm_bf16": True})):
            step, (carry,) = _build_fsi_case(
                grid_size=(grid_n, grid_n, grid_n), mesh=mesh, sim_kwargs=kw
            )
            hlo = jax.jit(step).lower(carry).compile().as_text()
            arms[arm] = collective_stats(hlo)
        rows.append((mesh_shape, grid_n, arms))
        print(mesh_shape, arms["f32"][0], "launches:", arms["f32"][1],
              flush=True)

    def scaled_bytes(cb: dict, target: int, n: int) -> float:
        return sum(v * (target / n) ** SCALE_EXP[k] for k, v in cb.items())

    lines = [
        "# Pod scaling model (collective bytes -> Mcells/s/chip)",
        "",
        "Generated by `doc/tpu/pod_scaling_model.py` (virtual-mesh HLO; the",
        "SPMD collective set is backend-independent). Regenerated ROUND 5",
        "after the collective-bill cuts (VERDICT r04 next #1):",
        "",
        "- the sparse-IBM window exchange is now a `(3, n_markers)` psum",
        "  (shard-local window accumulation,",
        "  `parallel/windows.windowed_e2l_mm_sharded`) and the windowed",
        "  vorticity add is collective-free - the round-4 window",
        "  all-gathers are GONE from the HLO;",
        "- the vector Poisson solve BATCHES all 3 components into each",
        "  all_to_all (3x fewer collective launches, same bytes);",
        "- per-kind grid scaling: field-volume collectives scale (N/n)^3,",
        "  marker-bound reductions (N/n)^2 - the round-4 model scaled",
        "  everything cubically and overstated the IBM term ~5x at",
        "  production sizes (its own note).",
        "",
        "Predictions BRACKET a real pod run:",
        "`t_no_overlap = t_comp + t_comm` (floor) and",
        "`t_ideal = max(t_comp, t_comm)` (ceiling, full comm/compute",
        "overlap via the chunked transposes, fft.py overlap_chunks).",
        "Anchors: 447 Mcells/s (256^3-class per-chip load) / 369",
        "(512^3-class) - mesh-(1,1) steady-state sharded-step rates,",
        "fast-default config, round 4; ICI ~45 GB/s/direction (v5e).",
        "",
        "## Measured per-step per-chip collective bytes"
        f" (probe grid {grid_n}^3; f32 wire / bf16 wire arms)",
        "",
        "| mesh (z,y) | all-to-all | (launches) | collective-permute |"
        " all-reduce | all-gather | a2a bf16-wire |",
        "|---|---|---|---|---|---|---|",
    ]
    for mesh_shape, n, arms in rows:
        cb, cnt = arms["f32"]
        cb16, _ = arms["bf16-wire"]
        lines.append(
            f"| {mesh_shape} | {cb['all-to-all']:,} |"
            f" {cnt['all-to-all']} | {cb['collective-permute']:,} |"
            f" {cb['all-reduce']:,} | {cb['all-gather']:,} |"
            f" {cb16['all-to-all']:,} |"
        )
    lines += [
        "",
        "## Predicted production throughput (f32 wire)",
        "",
        "| mesh | global grid | per-chip cells | comm GB/chip/step |"
        " t_comm (ms) | t_comp (ms) | Mcells/s/chip floor (no overlap) |"
        " ceiling (ideal overlap) |",
        "|---|---|---|---|---|---|---|---|",
    ]
    pred = {}
    for mesh_shape, n, arms in rows:
        p = mesh_shape[0] * mesh_shape[1]
        cb, _ = arms["f32"]
        for target in (256, 512):
            total_b = scaled_bytes(cb, target, n)
            per_chip_cells = target**3 / p
            per_chip_n = round(per_chip_cells ** (1 / 3))
            rate = anchor_rate[256] if per_chip_n <= 384 else anchor_rate[512]
            t_comp = per_chip_cells / rate
            t_comm = total_b / bw_ici
            floor = per_chip_cells / (t_comp + t_comm) / 1e6
            ceil = per_chip_cells / max(t_comp, t_comm) / 1e6
            pred[(mesh_shape, target)] = (floor, ceil)
            lines.append(
                f"| {mesh_shape} | {target}^3 | {per_chip_cells:.2e} | "
                f"{total_b / 1e9:.2f} | {t_comm * 1e3:.1f} | "
                f"{t_comp * 1e3:.1f} | {floor:.0f} | {ceil:.0f} |"
            )
    lines += [
        "",
        "## bf16 wire format (opt-in, `comm_bf16=True`)",
        "",
        "Halves the all_to_all payload (complex64 -> re/im bf16 BIT-PACKED",
        "into one uint32/element; convert-fusion cannot widen it back),
measured solve rel err ~1e-3 class vs the f32 wire",
        "(tests/test_parallel/test_fft.py::"
        "test_comm_bf16_halves_transpose_bytes_within_error_budget).",
        "A pure bytes/accuracy trade for comm-bound pods; OFF by default -",
        "the default fast_spectral tier keeps ~6.6e-6 via 3-pass hi/lo",
        "MATMULS, which a wire format cannot match without giving the",
        "bytes back.",
        "",
        "## Provenance & protocol",
        "",
        "Anchor provenance: mesh-(1,1) steady-state runs of the SHARDED",
        "fused step on one v5e chip (round 4, fast default): 256^3 =",
        "37.5 ms/step (447 Mcells/s; meshless 35.7), 512^3 = 363.4",
        "ms/step (369 Mcells/s; meshless 348.6) -",
        "doc/probe_sharded_step_ablation.py protocol.",
        "",
        "First real pod run protocol: measure `overlap_chunks=1` vs the",
        "default 4 (doc/tpu/pod_flow_past_sphere.py --overlap-chunks) and",
        "compare against the floor/ceiling bracket above; below-floor =>",
        "transposes not overlapping or DCN hops in the mesh; above-ceiling",
        "=> modeling error (report it).",
        "",
    ]
    out_path = os.path.join(os.path.dirname(__file__), "SCALING.md")
    with open(out_path, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out_path}")
    return pred


if __name__ == "__main__":
    main()
