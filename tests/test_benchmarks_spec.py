"""Wholesale port of the upstream benchmark test spec (VERDICT r3 #4).

Case-by-case translation of /root/reference/tests/test_mcu_benchmarks.py
(901 LoC) and /root/reference/tests/test_benchmark_integration.py (542 LoC)
— torch model objects replaced by this framework's `models.api` objects,
assertion VALUES kept. Each test cites the upstream case it ports.
`tests/test_benchmarks.py` keeps the original condensed suite; this file
supersets it to the full contract.

Deliberate divergences (documented once, referenced inline):

D1 — conv stride convention. Upstream's test derives the expected conv
  MACs from the torch module's ctor stride `(input_size-1)//(grid-1)`
  (floor) even when a larger input_shape is passed; its own C++ engine
  recomputes `ceil((H-1)/(grid-1))` at runtime (nnue_engine.cpp:667-675)
  so the two disagree off the native size — a known upstream defect
  (SURVEY §7 hard-part 5). Our `count_mac_operations` follows the
  ENGINE (deploy-faithful ceil from the actual input), so expected
  values here are computed with that convention.

D2 — FT weight dtype. Upstream's test asserts the in-memory quantized FT
  weight is int8 (test_mcu_benchmarks.py:261) while its serializer
  widens the same tensor to int16 on disk (serialize.py:408-412). Ours
  keeps the FORMAT dtype (int16) end to end; the assertion is adjusted
  and the remaining dtypes match the spec exactly.

D3 — model/data geometry. Upstream evaluates a model built for 32x32 on
  96x96-resized CIFAR (its torch conv silently produces an oversized
  grid). Our functional model bakes engine-faithful conv geometry into
  its config, so fixtures that EXECUTE the model use matching
  input_size; pure-math cases keep the upstream 96x96 values.
"""

import json

import numpy as np
import pytest

from benchmarks.mcu_simulation import (
    MCU_SPECS,
    MCUSpecs,
    ModelStats,
    analyze_sparsity,
    count_mac_operations,
    count_model_parameters,
    estimate_energy_consumption,
    estimate_memory_usage,
    estimate_quantized_model_size,
    generate_model_stats,
    run_mcu_benchmark,
    simulate_mcu_latency,
)
from benchmarks.tinyml_benchmarks import (
    TINYML_BASELINES,
    BaselineComparison,
    MLPerfTinyResult,
    compare_with_baselines,
    evaluate_model_accuracy,
    generate_tinyml_report,
    run_mlperf_tiny_benchmark,
)
from nnue_vision_tpu.data.datasets import GenericVisionDataset
from nnue_vision_tpu.data.loaders import ArrayLoader
from nnue_vision_tpu.models.api import NNUE
from nnue_vision_tpu.models.nnue import GridFeatureSet


# --- fixtures (upstream test_mcu_benchmarks.py:46-89) ----------------------

@pytest.fixture(scope="module")
def small_nnue_model():
    """Upstream small_nnue_model (:46-62): grid 4x8, L1/L2/L3 = 64/8/16."""
    return NNUE(feature_set=GridFeatureSet(4, 8), l1_size=64, l2_size=8,
                l3_size=16, num_classes=10, input_size=32)


@pytest.fixture(scope="module")
def binary_loader():
    """Upstream test_data_loader (:65-76): cifar10 test split, 50 samples,
    binary remap positive=airplane. Native 32x32 here (divergence D3)."""
    ds = GenericVisionDataset(
        dataset_name="cifar10", split="test", max_samples=50,
        binary_classification={"positive_classes": ["airplane"]},
        synthetic_size=64,
    )
    return ArrayLoader(ds, batch_size=8, shuffle=False)


@pytest.fixture
def test_mcu_spec():
    """Upstream test_mcu_spec (:79-89), values verbatim."""
    return MCUSpecs(name="Test MCU", peak_ops_per_second=100e6,
                    memory_flash_kb=512, memory_ram_kb=128,
                    power_active_mw=50, power_idle_mw=2)


def _stats(**over):
    """Upstream's hand-built ModelStats (:328-341), values verbatim."""
    kw = dict(
        total_parameters=1000, trainable_parameters=1000,
        total_macs=100000, conv_macs=50000, linear_macs=30000,
        feature_transformer_macs=20000, model_size_bytes=4000,
        activation_memory_bytes=1000, quantized_model_size_bytes=1000,
        quantization_bit_width=8, sparsity_ratio=0.5, effective_macs=50000,
    )
    kw.update(over)
    return ModelStats(**kw)


# --- TestParameterCounting (:92-114) ----------------------------------------

def test_count_model_parameters(small_nnue_model):
    """:95-107 — counting matches the framework's own parameter count."""
    import jax

    total, trainable = count_model_parameters(small_nnue_model)
    expected = sum(
        int(np.prod(np.shape(x)))
        for x in jax.tree_util.tree_leaves(small_nnue_model.params)
    )
    assert total == expected
    assert trainable == expected  # all params trainable, as upstream
    assert trainable <= total


def test_parameter_count_consistency(small_nnue_model):
    """:109-114"""
    assert count_model_parameters(small_nnue_model) == \
        count_model_parameters(small_nnue_model)


# --- TestMACOperations (:117-174) -------------------------------------------

def test_conv_mac_calculation(small_nnue_model):
    """:120-142 — conv MACs at input_shape (3, 96, 96). Expected value uses
    the deploy-faithful ceil stride (divergence D1)."""
    macs = count_mac_operations(small_nnue_model, input_shape=(3, 96, 96))
    grid = small_nnue_model.feature_set.grid_size
    ch = small_nnue_model.feature_set.num_features_per_square
    stride = -(-(96 - 1) // (grid - 1))  # ceil, engine convention
    out_h = out_w = 96 // stride
    expected = ch * 3 * 3 * 3 * out_h * out_w
    assert macs["conv"] == expected
    assert macs["conv"] > 0


def test_feature_transformer_mac_calculation(small_nnue_model):
    """:144-154"""
    macs = count_mac_operations(small_nnue_model)
    expected = (small_nnue_model.feature_set.num_features
                * small_nnue_model.l1_size)
    assert macs["feature_transformer"] == expected
    assert macs["feature_transformer"] > 0


def test_total_mac_calculation(small_nnue_model):
    """:156-167"""
    macs = count_mac_operations(small_nnue_model)
    assert macs["total"] == (macs["conv"] + macs["feature_transformer"]
                             + macs["linear"])
    assert macs["total"] > 0


def test_mac_counts_positive(small_nnue_model):
    """:169-174"""
    for key, count in count_mac_operations(small_nnue_model).items():
        assert count >= 0, f"MAC count for {key} should be non-negative"


# --- TestMemoryAnalysis (:177-225) -------------------------------------------

def test_memory_estimation_structure(small_nnue_model):
    """:180-195"""
    mem = estimate_memory_usage(small_nnue_model)
    for key in ("model_parameters", "activations", "working_buffers", "total"):
        assert key in mem and mem[key] >= 0
    component_sum = (mem["model_parameters"] + mem["activations"]
                     + mem["working_buffers"])
    assert abs(mem["total"] - component_sum) < 100


def test_model_parameter_memory(small_nnue_model):
    """:197-203"""
    mem = estimate_memory_usage(small_nnue_model)
    total, _ = count_model_parameters(small_nnue_model)
    assert mem["model_parameters"] == total * 4


def test_memory_scales_with_model_size():
    """:205-225 — grid 4x4 L1=32 vs grid 8x8 L1=128, values verbatim."""
    small = NNUE(feature_set=GridFeatureSet(4, 4), l1_size=32, l2_size=4,
                 l3_size=8, num_classes=10, input_size=32)
    large = NNUE(feature_set=GridFeatureSet(8, 8), l1_size=128, l2_size=16,
                 l3_size=32, num_classes=10, input_size=32)
    small_mem = estimate_memory_usage(small)
    large_mem = estimate_memory_usage(large)
    assert large_mem["total"] > small_mem["total"]
    assert large_mem["model_parameters"] > small_mem["model_parameters"]


# --- TestQuantization (:228-267) ----------------------------------------------

def test_quantized_model_size(small_nnue_model):
    """:231-241"""
    qsize = estimate_quantized_model_size(small_nnue_model)
    assert qsize > 0
    total, _ = count_model_parameters(small_nnue_model)
    assert qsize < total * 4


def test_quantization_compression_ratio(small_nnue_model):
    """:243-248"""
    stats = generate_model_stats(small_nnue_model)
    assert stats.compression_ratio > 1.0
    assert stats.compression_ratio < 10.0


def test_quantized_data_consistency(small_nnue_model):
    """:250-267 — required keys + quantized dtypes. FT weight is int16
    here, the dtype the format actually serializes (divergence D2); all
    other dtype assertions match the spec."""
    data = small_nnue_model.get_quantized_model_data()
    assert "feature_transformer" in data
    assert "conv_layer" in data
    assert "metadata" in data
    ft = data["feature_transformer"]
    assert np.asarray(ft["weight"]).dtype == np.int16  # D2 (spec: int8)
    assert np.asarray(ft["bias"]).dtype == np.int32
    conv = data["conv_layer"]
    assert np.asarray(conv["weight"]).dtype == np.int8
    assert np.asarray(conv["bias"]).dtype == np.int32


# --- TestSparsityAnalysis (:270-320) -------------------------------------------

def test_sparsity_analysis_structure(small_nnue_model, binary_loader):
    """:273-282"""
    s = analyze_sparsity(small_nnue_model, binary_loader, num_samples=10)
    for key in ("avg_sparsity", "min_sparsity", "max_sparsity",
                "std_sparsity"):
        assert key in s
        assert 0.0 <= s[key] <= 1.0


def test_sparsity_bounds(small_nnue_model, binary_loader):
    """:284-292"""
    s = analyze_sparsity(small_nnue_model, binary_loader, num_samples=5)
    assert s["min_sparsity"] <= s["avg_sparsity"] <= s["max_sparsity"]
    assert s["std_sparsity"] >= 0.0


def test_sparsity_with_different_thresholds(binary_loader):
    """:294-320 — threshold 0.1 vs 0.9, same weights, sparsity monotone."""
    low = NNUE(feature_set=GridFeatureSet(4, 8), l1_size=32, l2_size=4,
               l3_size=8, num_classes=10, input_size=32)
    high = NNUE(feature_set=GridFeatureSet(4, 8), l1_size=32, l2_size=4,
                l3_size=8, num_classes=10, input_size=32)
    high.params = dict(low.params)
    low.set_visual_threshold(0.1)
    high.set_visual_threshold(0.9)
    s_low = analyze_sparsity(low, binary_loader, num_samples=5)
    s_high = analyze_sparsity(high, binary_loader, num_samples=5)
    assert s_high["avg_sparsity"] >= s_low["avg_sparsity"]


# --- TestLatencySimulation (:323-423) -------------------------------------------

def test_latency_simulation_structure(test_mcu_spec):
    """:326-353"""
    res = simulate_mcu_latency(_stats(), test_mcu_spec)
    for key in ("base_latency_ms", "with_overhead_ms", "quantized_latency_ms",
                "throughput_fps"):
        assert key in res
        assert res[key] > 0


def test_latency_scaling(test_mcu_spec):
    """:355-393 — 50k vs 200k MACs, values verbatim."""
    lo = simulate_mcu_latency(
        _stats(total_macs=50000, conv_macs=25000, linear_macs=15000,
               feature_transformer_macs=10000, effective_macs=25000),
        test_mcu_spec)
    hi = simulate_mcu_latency(
        _stats(total_parameters=2000, trainable_parameters=2000,
               total_macs=200000, conv_macs=100000, linear_macs=60000,
               feature_transformer_macs=40000, model_size_bytes=8000,
               activation_memory_bytes=2000, quantized_model_size_bytes=2000,
               effective_macs=100000),
        test_mcu_spec)
    assert hi["quantized_latency_ms"] > lo["quantized_latency_ms"]
    assert lo["throughput_fps"] > hi["throughput_fps"]


def test_sparsity_benefits(test_mcu_spec):
    """:395-423 — 80% sparsity, effective 20k of 100k MACs."""
    stats = _stats(sparsity_ratio=0.8, effective_macs=20000)
    sparse = simulate_mcu_latency(stats, test_mcu_spec, use_sparsity=True)
    dense = simulate_mcu_latency(stats, test_mcu_spec, use_sparsity=False)
    assert sparse["quantized_latency_ms"] < dense["quantized_latency_ms"]
    assert sparse["throughput_fps"] > dense["throughput_fps"]


# --- TestEnergyEstimation (:426-462) ------------------------------------------

def test_energy_estimation_structure(test_mcu_spec):
    """:429-442"""
    e = estimate_energy_consumption(50.0, test_mcu_spec)
    for key in ("active_energy_mj", "idle_energy_mj", "total_energy_mj",
                "total_energy_uj"):
        assert key in e
        assert e[key] >= 0


def test_energy_scales_with_latency(test_mcu_spec):
    """:444-453"""
    short = estimate_energy_consumption(10.0, test_mcu_spec)
    long = estimate_energy_consumption(100.0, test_mcu_spec)
    assert long["total_energy_mj"] > short["total_energy_mj"]
    assert long["total_energy_uj"] > short["total_energy_uj"]


def test_energy_unit_conversion(test_mcu_spec):
    """:455-462 — uJ = mJ * 1000 within 0.001."""
    e = estimate_energy_consumption(50.0, test_mcu_spec)
    assert abs(e["total_energy_uj"] - e["total_energy_mj"] * 1000) < 0.001


# --- TestAccuracyEvaluation (:465-512) -----------------------------------------

def test_accuracy_evaluation_structure(small_nnue_model, binary_loader):
    """:468-479"""
    m = evaluate_model_accuracy(small_nnue_model, binary_loader, None,
                                num_samples=20)
    assert "accuracy" in m and "total_samples" in m
    assert 0.0 <= m["accuracy"] <= 1.0
    assert m["total_samples"] > 0


def test_accuracy_with_different_sample_counts(small_nnue_model,
                                               binary_loader):
    """:481-494"""
    small = evaluate_model_accuracy(small_nnue_model, binary_loader, None,
                                    num_samples=5)
    large = evaluate_model_accuracy(small_nnue_model, binary_loader, None,
                                    num_samples=20)
    assert small["total_samples"] <= large["total_samples"]
    assert small["total_samples"] <= 5
    assert large["total_samples"] <= 20


def test_accuracy_binary_classification_metrics(binary_loader):
    """:496-512 — binary remap loader must yield all four metrics."""
    model = NNUE(feature_set=GridFeatureSet(4, 8), l1_size=32, l2_size=4,
                 l3_size=8, num_classes=10, input_size=32)
    m = evaluate_model_accuracy(model, binary_loader, None, num_samples=10)
    for key in ("accuracy", "precision", "recall", "f1_score",
                "total_samples"):
        assert key in m
        if key != "total_samples":
            assert 0.0 <= m[key] <= 1.0


# --- TestMLPerfIntegration (:515-557) -------------------------------------------

def test_mlperf_result_structure(small_nnue_model, binary_loader,
                                 test_mcu_spec):
    """:518-537"""
    result = run_mlperf_tiny_benchmark(
        small_nnue_model, "test_dataset", binary_loader, None,
        test_mcu_spec, num_samples=10,
    )
    assert isinstance(result, MLPerfTinyResult)
    assert result.dataset == "test_dataset"
    assert 0.0 <= result.accuracy <= 1.0
    assert result.latency_ms > 0
    assert result.energy_uj > 0
    assert result.model_size_kb > 0
    assert result.throughput_fps > 0


def test_mlperf_result_serialization(small_nnue_model, binary_loader,
                                     test_mcu_spec):
    """:539-557"""
    result = run_mlperf_tiny_benchmark(
        small_nnue_model, "test_dataset", binary_loader, None,
        test_mcu_spec, num_samples=5,
    )
    d = result.to_dict()
    assert isinstance(d, dict)
    assert len(json.dumps(d, default=str)) > 0


# --- TestBaselineComparison (:560-632) -------------------------------------------

def test_baseline_comparison_structure():
    """:563-578 — dataclass field values verbatim."""
    baseline = BaselineComparison(
        model_name="Test Model", dataset="test_dataset", accuracy=0.85,
        parameters=50000, macs=1000000, model_size_kb=200, latency_ms=50,
        paper="Test Paper",
    )
    assert baseline.model_name == "Test Model"
    assert baseline.accuracy == 0.85
    assert baseline.parameters == 50000


def test_compare_with_baselines():
    """:580-632 — values verbatim; NNUE better on every axis."""
    nnue_result = MLPerfTinyResult(
        dataset="test_dataset", accuracy=0.90, latency_ms=25.0,
        energy_uj=60.0, memory_peak_kb=150.0, model_size_kb=120.0,
        throughput_fps=40.0, sparsity_ratio=0.6, incremental_speedup=8.0,
    )
    original = TINYML_BASELINES.get("test_dataset", [])
    TINYML_BASELINES["test_dataset"] = [BaselineComparison(
        model_name="Test Baseline", dataset="test_dataset", accuracy=0.85,
        parameters=60000, macs=2000000, model_size_kb=240, latency_ms=50,
        energy_uj=120, paper="Test Paper",
    )]
    try:
        comparisons = compare_with_baselines(nnue_result, "test_dataset")
        assert "Test Baseline" in comparisons
        ratios = comparisons["Test Baseline"]["nnue_vs_baseline"]
        assert ratios["accuracy_ratio"] > 1.0
        assert ratios["latency_ratio"] < 1.0
        assert ratios["energy_ratio"] < 1.0
    finally:
        if original:
            TINYML_BASELINES["test_dataset"] = original
        else:
            TINYML_BASELINES.pop("test_dataset", None)


# --- TestErrorHandling / edge cases (:734-796) -----------------------------------

def test_model_stats_edge_cases():
    """:777-796 — tiny grid 2x2 model, zero target sparsity."""
    tiny = NNUE(feature_set=GridFeatureSet(2, 2), l1_size=8, l2_size=2,
                l3_size=4, num_classes=10, input_size=16)
    stats = generate_model_stats(tiny, target_sparsity=0.0)
    assert stats.total_parameters > 0
    assert stats.total_macs > 0
    assert stats.quantized_model_size_bytes > 0
    assert stats.sparsity_ratio == 0.0
    assert stats.effective_macs == stats.total_macs


# --- TestNumericalAccuracy (:799-835) ---------------------------------------------

def test_mac_calculation_precision(small_nnue_model):
    """:802-809 — 5 repeated calls, identical."""
    macs = count_mac_operations(small_nnue_model)
    for _ in range(5):
        assert count_mac_operations(small_nnue_model) == macs


def test_memory_calculation_precision(small_nnue_model):
    """:811-818"""
    mem = estimate_memory_usage(small_nnue_model)
    for _ in range(5):
        assert estimate_memory_usage(small_nnue_model) == mem


def test_quantization_deterministic(small_nnue_model):
    """:820-825"""
    assert (estimate_quantized_model_size(small_nnue_model)
            == estimate_quantized_model_size(small_nnue_model))


def test_energy_calculation_precision(test_mcu_spec):
    """:827-835 — latency 42.5 ms, per-key agreement < 1e-10."""
    e1 = estimate_energy_consumption(42.5, test_mcu_spec)
    e2 = estimate_energy_consumption(42.5, test_mcu_spec)
    for key in e1:
        assert abs(e1[key] - e2[key]) < 1e-10


# --- TestBenchmarkValidation (:839-897) --------------------------------------------

def test_known_model_metrics():
    """:842-875 — grid 4x4, L1/L2/L3 = 32/4/8: params in (2000, 5000),
    FT MACs exactly 64*32."""
    model = NNUE(feature_set=GridFeatureSet(4, 4), l1_size=32, l2_size=4,
                 l3_size=8, num_classes=10, input_size=32)
    total, _ = count_model_parameters(model)
    macs = count_mac_operations(model)
    assert 2000 < total < 5000
    assert macs["conv"] > 0
    assert macs["feature_transformer"] == 64 * 32
    assert macs["linear"] > 0
    assert macs["total"] == (macs["conv"] + macs["feature_transformer"]
                             + macs["linear"])


def test_sparsity_impact_validation(small_nnue_model, binary_loader):
    """:877-890 — effective_macs ≈ total*(1-sparsity) within 1000."""
    stats = generate_model_stats(small_nnue_model, binary_loader)
    if stats.sparsity_ratio > 0:
        assert stats.effective_macs < stats.total_macs
        expected = int(stats.total_macs * (1 - stats.sparsity_ratio))
        assert abs(stats.effective_macs - expected) < 1000


def test_compression_ratio_realistic(small_nnue_model):
    """:892-897 — 2x to 8x for mixed INT8/INT16."""
    stats = generate_model_stats(small_nnue_model)
    assert 2.0 <= stats.compression_ratio <= 8.0


# ===========================================================================
# test_benchmark_integration.py ports
# ===========================================================================

# --- TestBenchmarkScriptIntegration (:55-88) ----------------------------------

def test_run_mcu_benchmarks_script_imports():
    """:58-73 — script importable with main/parse_arguments/load_model."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent.parent / "scripts"))
    import run_mcu_benchmarks

    assert hasattr(run_mcu_benchmarks, "main")
    assert hasattr(run_mcu_benchmarks, "parse_arguments")
    assert hasattr(run_mcu_benchmarks, "load_model")


def test_example_benchmark_script_imports():
    """:75-88"""
    import run_example_benchmark

    assert hasattr(run_example_benchmark, "main")
    assert hasattr(run_example_benchmark, "create_example_model")


# --- TestEndToEndBenchmarkWorkflow (:91-231) ------------------------------------

def test_complete_mcu_benchmark_workflow(small_nnue_model, binary_loader):
    """:94-134 — cortex_m4 + cortex_m33, target_sparsity 0.6."""
    results = run_mcu_benchmark(
        model=small_nnue_model, data_loader=binary_loader,
        mcu_specs=[MCU_SPECS["cortex_m4"], MCU_SPECS["cortex_m33"]],
        target_sparsity=0.6, verbose=False,
    )
    assert "model_stats" in results and "mcu_results" in results
    stats = results["model_stats"]
    assert stats.total_parameters > 0
    assert stats.total_macs > 0
    assert stats.sparsity_ratio == 0.6
    for mcu_name in ("ARM Cortex-M4", "ARM Cortex-M33"):
        assert mcu_name in results["mcu_results"]
        r = results["mcu_results"][mcu_name]
        for key in ("latency", "energy", "memory_fit", "efficiency_metrics"):
            assert key in r
        assert r["latency"]["quantized_latency_ms"] > 0
        assert r["energy"]["total_energy_uj"] > 0
        assert r["efficiency_metrics"]["fps"] > 0


def test_complete_tinyml_report_workflow(small_nnue_model, binary_loader,
                                         tmp_path):
    """:136-202 — visual_wake_words report with all sections."""
    out = tmp_path / "test_report.json"
    report = generate_tinyml_report(
        model=small_nnue_model, dataset_name="visual_wake_words",
        data_loader=binary_loader, device=None,
        mcu_specs=[MCU_SPECS["cortex_m33"]], output_path=out,
    )
    for section in ("model_info", "mlperf_results", "baseline_comparisons",
                    "incremental_update_analysis", "summary"):
        assert section in report, f"Missing section: {section}"
    info = report["model_info"]
    assert info["name"] == "NNUE-Vision"
    assert info["dataset"] == "visual_wake_words"
    assert "architecture" in info
    mlperf = report["mlperf_results"]
    assert "ARM Cortex-M33" in mlperf
    cortex = mlperf["ARM Cortex-M33"]
    assert cortex["accuracy"] >= 0.0
    assert cortex["latency_ms"] > 0
    assert cortex["energy_uj"] > 0
    assert cortex["model_size_kb"] > 0
    incr = report["incremental_update_analysis"]
    assert "speedup" in incr and "sequences_tested" in incr
    summary = report["summary"]
    assert "best_platform" in summary
    assert "key_advantages" in summary and len(summary["key_advantages"]) > 0
    assert out.exists()
    assert json.loads(out.read_text())["model_info"]["name"] == "NNUE-Vision"


def test_model_serialization_integration(small_nnue_model, tmp_path):
    """:204-231 — serialize + quantized data + size vs float."""
    from nnue_vision_tpu.formats import write_nnue

    nnue_path = tmp_path / "test_model.nnue"
    write_nnue(small_nnue_model.quantize(), nnue_path)
    assert nnue_path.exists()

    data = small_nnue_model.get_quantized_model_data()
    assert "feature_transformer" in data
    assert "conv_layer" in data
    assert "metadata" in data

    qsize = estimate_quantized_model_size(small_nnue_model)
    total, _ = count_model_parameters(small_nnue_model)
    assert qsize < total * 4
    assert qsize > 0


# --- TestBenchmarkAccuracy (:235-362) ----------------------------------------------

def test_latency_scaling_accuracy():
    """:281-334 — 100k vs 400k MACs on cortex_m33; latency roughly
    proportional to effective MACs (within 2x)."""
    lo = _stats(effective_macs=50000)
    hi = _stats(total_parameters=2000, trainable_parameters=2000,
                total_macs=400000, conv_macs=200000, linear_macs=120000,
                feature_transformer_macs=80000, model_size_bytes=8000,
                activation_memory_bytes=2000,
                quantized_model_size_bytes=2000, effective_macs=200000)
    spec = MCU_SPECS["cortex_m33"]
    lo_lat = simulate_mcu_latency(lo, spec)
    hi_lat = simulate_mcu_latency(hi, spec)
    assert hi_lat["quantized_latency_ms"] > lo_lat["quantized_latency_ms"]
    assert lo_lat["throughput_fps"] > hi_lat["throughput_fps"]
    mac_ratio = hi.effective_macs / lo.effective_macs
    latency_ratio = (hi_lat["quantized_latency_ms"]
                     / lo_lat["quantized_latency_ms"])
    assert 0.5 * mac_ratio < latency_ratio < 2.0 * mac_ratio


def test_energy_calculation_accuracy():
    """:336-362 — energy monotone in latency; active energy within
    0.8–1.2x of power_active_mw * latency (spec's unit convention)."""
    spec = MCU_SPECS["cortex_m33"]
    latencies = [10.0, 50.0, 100.0]
    energies = [estimate_energy_consumption(lat, spec) for lat in latencies]
    for i in range(1, len(energies)):
        assert (energies[i]["total_energy_uj"]
                > energies[i - 1]["total_energy_uj"])
    for lat, energy in zip(latencies, energies):
        expected_active = spec.power_active_mw * lat
        assert 0.8 * expected_active < energy["active_energy_mj"] \
            < 1.2 * expected_active


# --- TestBenchmarkRobustness (:365-444) ----------------------------------------------

def test_very_small_model():
    """:368-384 — grid 2x2 L1=8."""
    tiny = NNUE(feature_set=GridFeatureSet(2, 2), l1_size=8, l2_size=2,
                l3_size=4, num_classes=10, input_size=16)
    stats = generate_model_stats(tiny, target_sparsity=0.0)
    assert stats.total_parameters > 0
    assert stats.total_macs > 0
    assert stats.quantized_model_size_bytes > 0


def test_very_large_model():
    """:386-406 — grid 8x16, L1/L2/L3 = 256/32/64: >10k params, >100k
    MACs, sparsity 0.7 respected."""
    large = NNUE(feature_set=GridFeatureSet(8, 16), l1_size=256, l2_size=32,
                 l3_size=64, num_classes=10, input_size=32)
    stats = generate_model_stats(large, target_sparsity=0.7)
    assert stats.total_parameters > 10000
    assert stats.total_macs > 100000
    assert stats.sparsity_ratio == 0.7


def test_extreme_sparsity_values(small_nnue_model):
    """:408-423 — 0% and 99% sparsity; speedup > 50 at 99%."""
    dense = generate_model_stats(small_nnue_model, target_sparsity=0.0)
    assert dense.sparsity_ratio == 0.0
    assert dense.effective_macs == dense.total_macs
    sparse = generate_model_stats(small_nnue_model, target_sparsity=0.99)
    assert sparse.sparsity_ratio == 0.99
    assert sparse.effective_macs < dense.effective_macs
    assert sparse.sparsity_speedup > 50.0


def test_different_input_sizes(small_nnue_model):
    """:425-444 — (32,32), (96,96), (128,128) all valid."""
    for h, w in ((32, 32), (96, 96), (128, 128)):
        macs = count_mac_operations(small_nnue_model, input_shape=(3, h, w))
        assert macs["conv"] > 0
        assert macs["total"] > 0


# --- integration TestBenchmarkValidation (:447-538) -------------------------------

def test_integration_compression_ratio_realistic(small_nnue_model):
    """:450-462"""
    stats = generate_model_stats(small_nnue_model)
    assert 2.0 <= stats.compression_ratio <= 8.0
    assert stats.quantized_model_size_bytes < stats.model_size_bytes


def test_energy_efficiency_realistic(small_nnue_model, binary_loader):
    """:464-496 — cortex_m33: energy/inference in [1, 10000] uJ, fps in
    [1, 100000], macs_per_ms > 0."""
    results = run_mcu_benchmark(
        model=small_nnue_model, data_loader=binary_loader,
        mcu_specs=[MCU_SPECS["cortex_m33"]], verbose=False,
    )
    eff = results["mcu_results"]["ARM Cortex-M33"]["efficiency_metrics"]
    assert 1.0 <= eff["energy_per_inference_uj"] <= 10000.0
    assert 1.0 <= eff["fps"] <= 100000.0
    assert eff["macs_per_ms"] > 0


def test_baseline_comparison_realistic(small_nnue_model, binary_loader):
    """:498-538 — visual_wake_words baselines; every ratio in
    [0.0001, 10000]."""
    result = run_mlperf_tiny_benchmark(
        small_nnue_model, "visual_wake_words", binary_loader, None,
        MCU_SPECS["cortex_m33"], num_samples=20,
    )
    comparisons = compare_with_baselines(result, "visual_wake_words")
    assert comparisons  # baselines exist for visual_wake_words
    for name, comparison in comparisons.items():
        for ratio_name, val in comparison["nnue_vs_baseline"].items():
            if isinstance(val, (int, float)):
                assert 0.0001 <= val <= 10000.0, \
                    f"Unrealistic {ratio_name}: {val}"
