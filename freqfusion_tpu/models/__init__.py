"""Model zoo: frozen experts (NAFNet-64, DAT, HAT-L) and the trainable fusion head."""
