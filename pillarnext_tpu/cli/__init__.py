"""Console entry points (pnx-train / pnx-test / pnx-create-data /
pnx-create-gt-database) — the packaged twins of the reference tools/
scripts (reference setup.py:27-39 installs det3d as a package).
"""
