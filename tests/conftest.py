"""Test configuration: CPU backend with 8 virtual devices by default.

Sharding tests run on a simulated 8-device mesh per SURVEY.md §4(d); the
config must be set before the JAX backend initialises. Set
``RAYTRACER_TEST_TPU=1`` to run the suite against real hardware instead
(enables the TPU-only megakernel tests).
"""

import os

import jax

if os.environ.get("RAYTRACER_TEST_TPU") != "1":
    # Drop the accelerator-tunnel hook's gate variable BEFORE backend
    # discovery: the site hook dials the remote TPU tunnel during
    # discovery even under JAX_PLATFORMS=cpu, and a second dial can abort
    # a concurrently running hardware session (observed 2026-08-19: a
    # CPU-suite run killed a make test-tpu mid-flight with ABORTED).
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

jax.config.update("jax_enable_x64", False)

import pytest  # noqa: E402

# Quick tier (`pytest -m quick`): everything except the long-running tests
# below. The list is measured, not guessed — tests whose call time exceeded
# ~4.5 s in the full-suite --durations report (docs/TESTLOG.md round 4).
# A new slow test that is not added here only slows the quick tier down; it
# cannot lose coverage (the default run ignores markers entirely).
_SLOW_TESTS = {
    "test_pallas.py::test_lane_traversal_matches_shared_sweep",
    "test_fidelity.py::test_scene0_matches_reference_render",
    "test_pallas.py::test_blocked_nearfirst_matches_static_order",
    "test_pallas.py::test_blocked_maskpop_matches_plain_blocked",
    "test_pallas.py::test_blocked_kernel_matches_oracle",
    "test_pallas.py::test_blocked_trionly_empty_sphere_pool",
    "test_pallas.py::test_maskpop_matches_gate_sweep",
    "test_pallas.py::test_pallas_backend_full_trace_agrees",
    "test_pallas.py::test_pallas_resolve_matches_xla",
    "test_pallas.py::test_pallas_matches_xla_nearest_hit",
    "test_pallas.py::test_pallas_super_clusters_match_oracle",
    "test_pallas.py::test_cell_ordered_traversal_matches_oracle",
    "test_megakernel.py::test_mega_image_texture_matches_regen",
    "test_megakernel.py::test_mega_matches_regen_statistically",
    "test_megakernel.py::test_mega_deterministic",
    "test_megakernel.py::test_mega_tile_offset_shard_invariance",
    "test_megakernel.py::test_mega_hbm_paged_textures_match_vmem",
    "test_megakernel.py::test_auto_sampler_falls_back_off_tpu",
    "test_parallel.py::test_pixel_sharded_lanesort_equals_single_device",
    "test_parallel.py::test_hybrid_sharded_matches_manual_slice_mean",
    "test_parallel.py::test_renderer_hybrid_mode_end_to_end",
    "test_parallel.py::test_spp_mode_checkpoint_resume",
    "test_parallel.py::test_pixel_sharded_two_frames_progress",
    "test_parallel.py::test_renderer_sharded_end_to_end",
    "test_parallel.py::test_elastic_resume_across_topologies",
    "test_parallel.py::test_coherent_pixel_shards_draw_distinct_streams",
    "test_parallel.py::test_renderer_spp_sharded_mode",
    "test_parallel.py::test_spp_sharded_mode",
    "test_parallel.py::test_pixel_sharded_equals_single_device",
    "test_integrator.py::test_progressive_accumulation_converges",
    "test_integrator.py::test_reproducible_same_key",
    "test_integrator.py::test_backends_agree",
    "test_integrator.py::test_emissive_does_not_terminate_by_default",
    "test_roulette.py::test_rr_is_unbiased_and_cheaper",
    "test_roulette.py::test_rr_first_bounces_protected",
    "test_roulette.py::test_rr_mega_unbiased_and_cheaper",
    "test_roulette.py::test_rr_mega_first_bounces_protected",
    "test_regen.py::test_regen_matches_scan_statistically",
    "test_regen.py::test_lanesort_bitwise_equals_regen",
    "test_regen.py::test_rebin_bitwise_equals_regen",
    "test_regen.py::test_regen_deterministic",
    "test_elastic.py::test_recovery_from_unclean_checkpoint_cadence",
    "test_elastic.py::test_rebuild_failure_consumes_retries_not_the_run",
    "test_elastic.py::test_recovery_is_bitwise_identical",
    "test_elastic.py::test_poisoned_accumulator_never_overwrites_checkpoint",
    "test_elastic.py::test_cli_retries_wiring",
    "test_elastic.py::test_nontransient_error_is_fatal",
    "test_golden.py::test_progressive_variance_decreases",
    "test_golden.py::test_scene_matches_golden",
    "test_morton.py::test_renderer_image_matches_linear_order",
    "test_film_renderer.py::test_checkpoint_resume",
    "test_film_renderer.py::test_renderer_health_and_profile",
    "test_film_renderer.py::test_renderer_frames_and_image",
    "test_app.py::test_cli_render_small",
    "test_bench_scenes.py::test_rtiow_trio",
    "test_scatter_textures.py::test_refraction_exit_quirk_straight_through",
    "test_interactive.py::test_run_interactive_headless_flythrough",
    "test_roulette.py::test_rr_auto_sampler_allows_mega",
    "test_film_renderer.py::test_viewer_loop_png_sink",
    "test_film_renderer.py::test_stats_jsonl",
    "test_bench_scenes.py::test_cube_scene_variants",
    "test_bench_scenes.py::test_monkey_scene",
    "test_bench_scenes.py::test_stress_scene_small",
    "test_pallas.py::test_intersection_stats_with_clusters",
    "test_app.py::test_cli_compare",
    "test_app.py::test_cli_convert_textures",
    "test_smem_budget.py::test_budget_formula_matches_pack_scene_reference_scenes",
    "test_integrator.py::test_miss_gives_sky",
    "test_elastic.py::test_keyboard_interrupt_stops_cleanly",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.nodeid.split("/")[-1].split("[")[0]
        if base in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
        else:
            item.add_marker(pytest.mark.quick)
