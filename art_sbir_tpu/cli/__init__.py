"""Command-line entry points mirroring the reference flag surfaces:
``python -m art_sbir_tpu.cli.train``, ``.inference``, ``.pix2pix``,
``.photo2sketch``, ``.drawings``, ``.artwork_gen``, ``.data_setup``."""
