"""Model core: backbone, FPN, RPN, heads, losses, targets, detector graph."""
