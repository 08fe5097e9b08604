"""Framework utilities: config system, registry, builders."""
