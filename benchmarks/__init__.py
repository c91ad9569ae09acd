"""MCU simulation + TinyML benchmark suite.

The upstream repo imports this package from scripts/ and tests/ but never
shipped it (SURVEY.md §2.12 — the API is defined entirely by its
consumers). This implementation satisfies that test-defined spec against
this framework's model objects.
"""

from benchmarks.mcu_simulation import (  # noqa: F401
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
from benchmarks.tinyml_benchmarks import (  # noqa: F401
    TINYML_BASELINES,
    BaselineComparison,
    MLPerfTinyResult,
    benchmark_incremental_updates,
    compare_with_baselines,
    create_pareto_plot_data,
    evaluate_model_accuracy,
    generate_tinyml_report,
    run_mlperf_tiny_benchmark,
)
