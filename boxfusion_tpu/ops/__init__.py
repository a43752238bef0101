from boxfusion_tpu.ops.fitness_kernel import fitness_cells_pallas

__all__ = ["fitness_cells_pallas"]
