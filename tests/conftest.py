"""Test configuration: force CPU with 8 virtual devices.

Multi-device sharding tests run on a virtual CPU mesh (the TPU-world
substitute for multi-chip hardware); numerics tests run in float64 on CPU.
Must set flags before jax initializes a backend.
"""

import os

# The environment pins JAX_PLATFORMS=axon (TPU tunnel); tests must run on CPU
# with 8 virtual devices. XLA_FLAGS must be set before backend init, and the
# platform override must go through jax.config (env var is pre-empted).
existing = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in existing:
    os.environ["XLA_FLAGS"] = (existing + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute distributed/MG/e2e tests; excluded from the "
        "fast lane (`pytest -m 'not slow'`, < 5 minutes) — run the full "
        "suite before landing solver or parallel changes")


# Fast-lane split (VERDICT r3 #6): everything measured >= ~8 s solo in the
# 2026-08-18 full-suite durations run (/tmp/suite_r4b.out, --durations=0)
# is marked slow HERE, in one tunable place, rather than scattering
# decorators over 15 files. Deliberately kept FAST despite being near the
# threshold: both reference goldens (the parity canaries) and the docx
# report test. Prefix match so parametrized ids stay covered.
_SLOW_TESTS = (
    # 2026-08-20 (round 5): group-ELL suite additions measured >= ~10 s
    # solo; the device-vs-host parity + pcg canaries stay fast.
    "test_assembly_groupell.py::test_pipeline_route_groupell",
    "test_assembly_groupell.py::test_apply_matches_einsum_operator",
    "test_assembly_groupell.py::test_symmetric_storage_matches_full",
    "test_assembly_groupell.py::test_constrained_apply_diagonal_block_jacobi",
    # 2026-08-19 re-measure (fast lane had crept to 666 s): the 2D-product
    # and refinement tests below postdate the original list.
    "test_refined.py::test_mixed_outer_f64_with_f32_vcycle_preconditioner",
    "test_plane_analysis.py::test_plane_modal_cantilever_matches_beam_theory",
    "test_plane_analysis.py::test_pcg_path_matches_exact_solution",
    "test_plane_analysis.py::test_cantilever_vs_timoshenko_beam",
    "test_multigrid2d.py::test_axisym_mg_matches_dense_lame",
    "test_multigrid2d.py::test_mg_iterations_mesh_size_independent",
    "test_multigrid2d.py::test_mg_matches_block_jacobi_solution",
    "test_tg_sharded.py::test_sharded_apply_matches_single_device",
    "test_lattice_precond.py::test_transfer_adjoint_and_symmetry",
    "test_assembly_tg.py::test_apply_matches_einsum_operator",
    "test_assembly_tg.py::test_pcg_solve_matches",
    "test_modal_structured.py::TestPipelineModal::test_modal_refine_pipeline",
    "test_product_reports.py::test_pipe_plot_and_report",
    "test_beam_configs.py::test_distributed_load_stress_exact_on_coarse_mesh",
    "test_assembly_cluster.py::test_cluster_constrained_solve_matches",
    "test_assembly_cluster.py::test_pipeline_cluster_operator_route",
    "test_assembly_tg.py::test_pipeline_routes_large_unstructured_through_tg",
    "test_beam_analysis.py::test_cantilever_mesh_invariance",
    "test_conv_apply.py::test_mg_pcg_solve_with_conv_routing",
    "test_conv_apply.py::test_parity_f64",  # each param pays a conv-graph compile
    "test_conv_apply.py::test_pipeline_structured_apply_arg",
    "test_conv_apply.py::test_symmetric",
    "test_distributed_pipeline.py::test_driver_padding_is_exact",
    "test_distributed_pipeline.py::test_pipeline_devices_conv_apply_matches",
    "test_distributed_pipeline.py::test_pipeline_devices_matches_single_device",
    "test_distributed_pipeline.py::test_pipeline_devices_unstructured_distributed",
    "test_distributed_pipeline.py::test_pipeline_devices_unstructured_f32_refined",
    "test_halo.py::test_distributed_multigrid_matches_single_device",
    "test_lattice_precond.py::test_iteration_reduction_and_solution",
    "test_lattice_precond.py::test_pruned_transfer_matches_dense",
    "test_modal_structured.py::TestPipelineModal::test_structured_vs_unstructured_pipeline",
    "test_modal_structured.py::TestPipelineModal::test_modal_refine_unstructured",
    "test_modal_lobpcg.py::test_lobpcg_matches_dense_lowest_modes",
    "test_modal_structured.py::TestShiftInvertModal::test_lobpcg_tol_wired",
    "test_modal_structured.py::TestShiftInvertModal::test_matches_dense_eigh",
    "test_modal_structured.py::TestShiftInvertModal::test_solid_modal_structured_mg",
    "test_multigrid.py::test_chebyshev_smoother_converges_and_matches",
    "test_multigrid.py::test_mg_anisotropic_semicoarsening_converges",
    "test_multigrid.py::test_mg_auto_path_anisotropic_box_no_crash",
    "test_multigrid.py::test_mg_cg_converges_fast_and_matches_bj",
    "test_multigrid.py::test_mg_even_grids_never_pad",
    "test_multigrid.py::test_mg_f32_converges",
    "test_multigrid.py::test_mg_ghost_padded_vcycle_is_symmetric",
    "test_multigrid.py::test_mg_ghost_padding_rescues_stuck_hierarchies",
    "test_multigrid.py::test_mg_hierarchy_disk_cache_roundtrip",
    "test_multigrid.py::test_mg_pytree_argument_equals_closure",
    "test_multigrid.py::test_proxy_lambda_max_matches_direct",
    "test_pallas.py::test_pallas_apply_matches_xla",
    "test_pipe_thermal.py::test_free_end_axial_equilibrium_and_relief",
    "test_pipe_thermal.py::test_pcg_path_and_input_validation",
    "test_product_reports.py::test_cli_plot_report_flags",
    "test_shaft_modal.py::test_free_torsion_drops_rigid_mode",
    "test_shaft_modal.py::test_hollow_raises_lateral_frequencies",
    "test_shaft_modal.py::test_mid_bearing_quadruples_first_critical",
    "test_shaft_modal.py::test_stepped_shaft_and_bearing_nodes",
    "test_parallel.py::test_distributed_cg_solution_matches",
    "test_parallel.py::test_dof_sharded_apply_matches",
    "test_parallel_modal.py::test_distributed_modal_matches_single_device",
    "test_parallel_modal.py::test_pipeline_modal_devices",
    "test_parallel_modal.py::test_pipeline_modal_devices_refine_bounds",
    "test_parallel_modal.py::test_pipeline_modal_devices_unstructured",
    "test_refined.py::test_adaptive_refinement_reaches_outer_tol_and_stops",
    "test_reorder.py::test_operator_invariant_under_reorder",
    "test_refined.py::test_f32_refined_matches_f64_to_1e8",
    "test_sharded_structured.py::test_phase_apply_matches_flat",
    "test_sharded_structured.py::test_slab_sharded_apply_matches",
    "test_sharded_structured.py::test_slab_sharded_cg_matches_single_device",
    "test_soa.py::test_block_jacobi_degenerate_node_is_finite",
    "test_solve_cases.py::test_solve_cases_distributed_structured",
    "test_solve_cases.py::test_solve_cases_unstructured",
    "test_structured.py::test_apply_bit_equal",
    "test_structured.py::test_constrained_solve_matches",
    "test_tg_lattice.py::test_distributed_solve_collectives_are_surface_sized",
    "test_tg_lattice.py::test_distributed_solve_device_count_invariance",
    "test_tg_lattice.py::test_distributed_solve_jittered_mesh",
    "test_tg_lattice.py::test_distributed_solve_matches_single_device",
    "test_tg_sharded.py::test_sharded_pcg_matches_single_device",
    "test_warping.py::test_box_J_vs_bredt",
    "test_warping.py::test_circle_J_and_kappa",
    "test_warping.py::test_hollow_circle_J",
    "test_warping.py::test_i_section_J_vs_thin_wall",
    "test_warping.py::test_rectangle_J_and_kappa",
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        tail = item.nodeid.split("tests/")[-1]
        if tail.startswith(_SLOW_TESTS):
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
