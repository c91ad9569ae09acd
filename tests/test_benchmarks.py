"""benchmarks/ package tests — the upstream test-defined spec
(SURVEY.md §2.12; upstream tests/test_mcu_benchmarks.py), against this
framework's model objects."""

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
    benchmark_incremental_updates,
    compare_with_baselines,
    evaluate_model_accuracy,
    generate_tinyml_report,
    run_mlperf_tiny_benchmark,
)
from nnue_vision_tpu.data.loaders import ArrayLoader
from nnue_vision_tpu.data.datasets import GenericVisionDataset
from nnue_vision_tpu.models.api import NNUE
from nnue_vision_tpu.models.nnue import GridFeatureSet


@pytest.fixture(scope="module")
def small_model():
    return NNUE(feature_set=GridFeatureSet(4, 8), l1_size=64, l2_size=8,
                l3_size=16, num_classes=10, input_size=32)


@pytest.fixture(scope="module")
def loader():
    ds = GenericVisionDataset(dataset_name="cifar10", split="test",
                              max_samples=40, synthetic_size=64)
    return ArrayLoader(ds, batch_size=8)


@pytest.fixture
def spec():
    return MCUSpecs(name="Test MCU", peak_ops_per_second=100e6,
                    memory_flash_kb=512, memory_ram_kb=128,
                    power_active_mw=50, power_idle_mw=2)


def _stats(total_macs=100_000, effective=50_000, sparsity=0.5):
    return ModelStats(
        total_parameters=1000, trainable_parameters=1000,
        total_macs=total_macs, conv_macs=total_macs // 2,
        linear_macs=int(total_macs * 0.3),
        feature_transformer_macs=int(total_macs * 0.2),
        model_size_bytes=4000, activation_memory_bytes=1000,
        quantized_model_size_bytes=1000, quantization_bit_width=8,
        sparsity_ratio=sparsity, effective_macs=effective,
    )


def test_mcu_specs_registry():
    assert MCU_SPECS["cortex_m4"].name == "ARM Cortex-M4"
    assert MCU_SPECS["cortex_m33"].name == "ARM Cortex-M33"
    assert MCU_SPECS["cortex_m7"].name == "ARM Cortex-M7"


def test_parameter_counting(small_model):
    total, trainable = count_model_parameters(small_model)
    assert total == small_model.count_parameters()
    assert trainable <= total
    assert count_model_parameters(small_model) == (total, trainable)


def test_mac_operations(small_model):
    macs = count_mac_operations(small_model)
    fs = small_model.feature_set
    assert macs["feature_transformer"] == fs.num_features * small_model.l1_size
    assert macs["total"] == macs["conv"] + macs["feature_transformer"] + macs["linear"]
    assert all(v >= 0 for v in macs.values())
    # conv MACs: out = in // stride convention
    cfg = small_model.cfg
    stride = max(1, -(-(32 - 1) // (fs.grid_size - 1)))
    out_hw = 32 // stride
    assert macs["conv"] == fs.num_features_per_square * 3 * 9 * out_hw * out_hw


def test_memory_estimation(small_model):
    mem = estimate_memory_usage(small_model)
    for key in ("model_parameters", "activations", "working_buffers", "total"):
        assert mem[key] >= 0
    total, _ = count_model_parameters(small_model)
    assert mem["model_parameters"] == total * 4
    assert abs(mem["total"] - (mem["model_parameters"] + mem["activations"]
                               + mem["working_buffers"])) < 100


def test_quantized_size_and_compression(small_model):
    qsize = estimate_quantized_model_size(small_model)
    total, _ = count_model_parameters(small_model)
    assert 0 < qsize < total * 4
    stats = generate_model_stats(small_model)
    assert 1.0 < stats.compression_ratio < 10.0


def test_sparsity_analysis(small_model, loader):
    s = analyze_sparsity(small_model, loader, num_samples=10)
    for key in ("avg_sparsity", "min_sparsity", "max_sparsity", "std_sparsity"):
        assert 0.0 <= s[key] <= 1.0
    assert s["min_sparsity"] <= s["avg_sparsity"] <= s["max_sparsity"]


def test_sparsity_monotone_in_threshold(loader):
    low = NNUE(feature_set=GridFeatureSet(4, 8), l1_size=32, l2_size=4,
               l3_size=8, num_classes=10, input_size=32)
    high = NNUE(feature_set=GridFeatureSet(4, 8), l1_size=32, l2_size=4,
                l3_size=8, num_classes=10, input_size=32)
    high.params = dict(low.params)
    low.set_visual_threshold(0.1)
    high.set_visual_threshold(0.9)
    s_low = analyze_sparsity(low, loader, num_samples=5)
    s_high = analyze_sparsity(high, loader, num_samples=5)
    assert s_high["avg_sparsity"] >= s_low["avg_sparsity"]


def test_latency_simulation(spec):
    res = simulate_mcu_latency(_stats(), spec)
    for key in ("base_latency_ms", "with_overhead_ms", "quantized_latency_ms",
                "throughput_fps"):
        assert res[key] > 0
    lo = simulate_mcu_latency(_stats(50_000, 25_000), spec)
    hi = simulate_mcu_latency(_stats(200_000, 100_000), spec)
    assert hi["quantized_latency_ms"] > lo["quantized_latency_ms"]
    assert lo["throughput_fps"] > hi["throughput_fps"]
    sparse = simulate_mcu_latency(_stats(100_000, 20_000, 0.8), spec, True)
    dense = simulate_mcu_latency(_stats(100_000, 20_000, 0.8), spec, False)
    assert sparse["quantized_latency_ms"] < dense["quantized_latency_ms"]


def test_energy_estimation(spec):
    e = estimate_energy_consumption(50.0, spec)
    for key in ("active_energy_mj", "idle_energy_mj", "total_energy_mj",
                "total_energy_uj"):
        assert e[key] >= 0
    assert abs(e["total_energy_uj"] - e["total_energy_mj"] * 1000) < 1e-3
    assert (estimate_energy_consumption(100.0, spec)["total_energy_mj"]
            > estimate_energy_consumption(10.0, spec)["total_energy_mj"])


def test_accuracy_evaluation(small_model, loader):
    m = evaluate_model_accuracy(small_model, loader, num_samples=20)
    for key in ("accuracy", "precision", "recall", "f1_score"):
        assert 0.0 <= m[key] <= 1.0
    assert 0 < m["total_samples"] <= 20


def test_accuracy_empty_loader(small_model):
    empty = ArrayLoader(
        GenericVisionDataset(dataset_name="cifar10", split="test",
                             max_samples=0, synthetic_size=8),
        batch_size=4,
    )
    m = evaluate_model_accuracy(small_model, empty)
    assert m["accuracy"] == 0.0 and m["total_samples"] == 0


def test_mlperf_result(small_model, loader, spec):
    result = run_mlperf_tiny_benchmark(
        small_model, "test_dataset", loader, None, spec, num_samples=10
    )
    assert isinstance(result, MLPerfTinyResult)
    assert result.dataset == "test_dataset"
    assert 0.0 <= result.accuracy <= 1.0
    assert result.latency_ms > 0 and result.energy_uj > 0
    assert result.model_size_kb > 0 and result.throughput_fps > 0
    assert json.dumps(result.to_dict(), default=str)


def test_compare_with_baselines():
    nnue_result = MLPerfTinyResult(
        dataset="tmp_ds", accuracy=0.90, latency_ms=25.0, energy_uj=60.0,
        memory_peak_kb=150.0, model_size_kb=120.0, throughput_fps=40.0,
        sparsity_ratio=0.6, incremental_speedup=8.0,
    )
    TINYML_BASELINES["tmp_ds"] = [BaselineComparison(
        model_name="Test Baseline", dataset="tmp_ds", accuracy=0.85,
        parameters=60000, macs=2_000_000, model_size_kb=240, latency_ms=50,
        energy_uj=120, paper="Test Paper",
    )]
    try:
        comparisons = compare_with_baselines(nnue_result, "tmp_ds")
        ratios = comparisons["Test Baseline"]["nnue_vs_baseline"]
        assert ratios["accuracy_ratio"] > 1.0
        assert ratios["latency_ratio"] < 1.0
        assert ratios["energy_ratio"] < 1.0
    finally:
        TINYML_BASELINES.pop("tmp_ds")


def test_incremental_updates(small_model, loader):
    result = benchmark_incremental_updates(
        small_model, loader, num_sequences=2, sequence_length=3
    )
    for key in ("full_recompute_avg_ms", "incremental_avg_ms", "speedup",
                "sequences_tested"):
        assert key in result
    assert result["sequences_tested"] >= 0
    assert result["speedup"] >= 1.0
    if result["sequences_tested"] > 0:
        assert result["incremental_avg_ms"] <= result["full_recompute_avg_ms"]


def test_run_mcu_benchmark(small_model, loader, spec):
    results = run_mcu_benchmark(model=small_model, data_loader=loader,
                                mcu_specs=[spec], target_sparsity=0.5,
                                verbose=False)
    assert "model_stats" in results
    assert results["model_stats"].sparsity_ratio == 0.5  # target respected
    mcu = results["mcu_results"][spec.name]
    for key in ("latency", "energy", "memory_fit", "efficiency_metrics"):
        assert key in mcu
    eff = mcu["efficiency_metrics"]
    assert eff["fps"] > 0 and eff["energy_per_inference_uj"] > 0
    assert eff["macs_per_ms"] > 0


def test_invalid_mcu_spec(small_model, loader):
    invalid = MCUSpecs("Invalid MCU", 0, 0, 0, 0, 0)
    results = run_mcu_benchmark(model=small_model, data_loader=loader,
                                mcu_specs=[invalid], verbose=False)
    assert invalid.name in results["mcu_results"]


def test_tinyml_report(small_model, loader, tmp_path):
    out = tmp_path / "report.json"
    report = generate_tinyml_report(
        model=small_model, dataset_name="test_dataset", data_loader=loader,
        mcu_specs=[MCUSpecs("Test MCU", 100e6, 512, 128, 50, 2)],
        output_path=out,
    )
    for key in ("model_info", "mlperf_results", "incremental_update_analysis",
                "summary"):
        assert key in report
    assert out.exists()
    saved = json.loads(out.read_text())
    assert saved["model_info"]["name"] == "NNUE-Vision"
    assert saved["summary"]["best_latency_ms"] > 0


def test_model_stats_edge_cases():
    tiny = NNUE(feature_set=GridFeatureSet(2, 2), l1_size=8, l2_size=2,
                l3_size=4, num_classes=10, input_size=16)
    stats = generate_model_stats(tiny, target_sparsity=0.0)
    assert stats.total_parameters > 0 and stats.total_macs > 0
    assert stats.quantized_model_size_bytes > 0
    assert stats.sparsity_ratio == 0.0
    assert stats.effective_macs == stats.total_macs
