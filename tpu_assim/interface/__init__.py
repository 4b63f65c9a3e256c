"""Algorithm interface layer (reference: /root/reference/pytassim/interface/)."""
