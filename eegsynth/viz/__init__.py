"""Figure factory: PCA/t-SNE cluster maps, real-vs-synth trace grids,
preprocessing stage figures."""
