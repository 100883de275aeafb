"""The pipeline language: YAML spec, template engine, step runner, registry."""
