"""Command-line tools: train, calc_metrics, gen_images, dataset_tool, projector."""
