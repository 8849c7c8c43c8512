from torch import nn

MetaModule = nn.Module
MetaConv2d = nn.Conv2d
MetaBatchNorm2d = nn.BatchNorm2d
MetaSequential = nn.Sequential
MetaLinear = nn.Linear
